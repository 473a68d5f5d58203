"""DenseVoxelNet (Yu et al. 2017).

Capability parity with the reference's ``DenseVoxelNet``
(/root/reference/models/three_d/densevoxelnet3d.py:90-129): stem conv k1 s2,
two 12-layer dense blocks (growth 12, bn_size 1, BN-ReLU-Conv k3 + dropout
0.2), transition (BN-ReLU-conv1 + maxpool, returning both), two-stage
ConvTranspose upsampling head, and the shared final 1x1x1 classifier.

Faithfully reproduced quirk (SURVEY §2.8): ``forward`` returns the
*auxiliary* prediction ``y2`` (densevoxelnet3d.py:116-128), not the main
path ``y1``; the main path is still computed (its BN running stats update
in the reference) and available via ``return_both``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import TorchConv, TorchConvTranspose, max_pool
from ...nn.norm import BatchNorm


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 1
    drop_rate: float = 0.2
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = TorchConv(
            features=self.bn_size * self.growth_rate, kernel_size=3, padding=1,
            use_bias=False, init_type=self.init_type, dtype=self.dtype,
        )(y)
        if self.drop_rate > 0:
            y = nn.Dropout(rate=self.drop_rate, deterministic=not train)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseVoxelNet(nn.Module):
    in_channels: int = 1
    classes: int = 2
    init_type: str = "none"
    dtype: Any = jnp.float32
    return_both: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)

        x = TorchConv(features=16, kernel_size=1, stride=2, use_bias=False, **kw)(x)
        for _ in range(12):
            x = _DenseLayer(growth_rate=12, init_type=self.init_type, dtype=self.dtype)(x, train)
        # transition: BN-ReLU-conv1 then maxpool; keep pre-pool tensor t
        t = TorchConv(features=160, kernel_size=1, **kw)(nn.relu(bn(x)))
        x = max_pool(t, 2)
        for _ in range(12):
            x = _DenseLayer(growth_rate=12, init_type=self.init_type, dtype=self.dtype)(x, train)

        # up block: BN-ReLU-conv1 -> transp k2s2 (128) -> transp k2s2 (64)
        x = TorchConv(features=304, kernel_size=1, use_bias=False, **kw)(nn.relu(bn(x)))
        x = TorchConvTranspose(features=128, kernel_size=2, stride=2, **kw)(x)
        x = TorchConvTranspose(features=64, kernel_size=2, stride=2, **kw)(x)

        conv_final = TorchConv(features=self.classes, kernel_size=1, use_bias=False, **kw)
        y1 = conv_final(x)

        # auxiliary path — the value the reference actually returns
        t = TorchConvTranspose(features=64, kernel_size=2, stride=2, **kw)(t)
        y2 = conv_final(t)
        if self.return_both:
            return y2.astype(jnp.float32), y1.astype(jnp.float32)
        return y2.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            classes=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
