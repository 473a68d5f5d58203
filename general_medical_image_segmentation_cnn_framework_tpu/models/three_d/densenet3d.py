"""3-D Skip-DenseNet (Bui et al., 3D-SkipDenseSeg).

Capability parity with the reference's ``SkipDenseNet3D``
(/root/reference/models/three_d/densenet3d.py:51-160): 3-conv stem, conv
k2s2 pool, 4 dense blocks (growth 16, block_config (4,4,4,4), bottleneck
bn_size 4, dropout 0.1), transitions (BN-ReLU-conv1 + BN-ReLU-conv k2s2),
per-block grouped-ConvTranspose upsampling heads (kernel 2^(i+1)+2, stride
2^(i+1), padding 1, groups=classes) concatenated with the stem features,
and a BN+ReLU+1x1 classifier. The reference hard-applies Kaiming init in
its ctor (:127-133) regardless of config — we default ``init_type`` to
kaiming for the same behavior.

Grouped transposed conv: lax has no feature groups for conv_transpose, so
groups are realized as per-group slices + separate transposes + concat
(identical math; groups == classes is small).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import TorchConv, TorchConvTranspose
from ...nn.norm import BatchNorm


class _GroupedConvTranspose(nn.Module):
    features: int
    groups: int
    kernel_size: int
    stride: int
    padding: int
    init_type: str = "kaiming"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0 and self.features % self.groups == 0
        in_per = in_ch // self.groups
        out_per = self.features // self.groups
        outs = []
        for g in range(self.groups):
            xg = x[..., g * in_per : (g + 1) * in_per]
            outs.append(
                TorchConvTranspose(
                    features=out_per,
                    kernel_size=self.kernel_size,
                    stride=self.stride,
                    padding=self.padding,
                    use_bias=False,
                    init_type=self.init_type,
                    dtype=self.dtype,
                )(xg)
            )
        return jnp.concatenate(outs, axis=-1)


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float
    init_type: str = "kaiming"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = TorchConv(
            features=self.bn_size * self.growth_rate, kernel_size=1,
            use_bias=False, init_type=self.init_type, dtype=self.dtype,
        )(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = TorchConv(
            features=self.growth_rate, kernel_size=3, padding=1,
            use_bias=False, init_type=self.init_type, dtype=self.dtype,
        )(y)
        if self.drop_rate > 0:
            y = nn.Dropout(rate=self.drop_rate, deterministic=not train)(y)
        return jnp.concatenate([x, y], axis=-1)


class SkipDenseNet3D(nn.Module):
    in_channels: int = 1
    classes: int = 2
    growth_rate: int = 16
    block_config: Tuple[int, ...] = (4, 4, 4, 4)
    num_init_features: int = 32
    drop_rate: float = 0.1
    bn_size: int = 4
    init_type: str = "kaiming"  # reference ctor forces kaiming (:127-133)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        f = self.num_init_features

        # stem: conv-BN-ReLU x2 + conv, skip features kept pre-BN
        y = TorchConv(features=f, kernel_size=3, padding=1, use_bias=False, **kw)(x)
        y = nn.relu(bn(y))
        y = TorchConv(features=f, kernel_size=3, padding=1, use_bias=False, **kw)(y)
        y = nn.relu(bn(y))
        stem = TorchConv(features=f, kernel_size=3, padding=1, use_bias=False, **kw)(y)
        y = nn.relu(bn(stem))
        out = TorchConv(features=f, kernel_size=2, stride=2, use_bias=False, **kw)(y)

        num_features = f
        ups = []
        for i, num_layers in enumerate(self.block_config):
            for _ in range(num_layers):
                out = _DenseLayer(
                    self.growth_rate, self.bn_size, self.drop_rate,
                    self.init_type, self.dtype,
                )(out, train)
            num_features += num_layers * self.growth_rate
            ups.append(
                _GroupedConvTranspose(
                    features=self.classes,
                    groups=self.classes,
                    kernel_size=2 ** (i + 1) + 2,
                    stride=2 ** (i + 1),
                    padding=1,
                    init_type=self.init_type,
                    dtype=self.dtype,
                )(out)
            )
            if i != len(self.block_config) - 1:
                # transition: BN-ReLU-conv1 -> BN-ReLU-conv k2s2
                t = TorchConv(
                    features=num_features // 2, kernel_size=1, use_bias=False, **kw
                )(nn.relu(bn(out)))
                out = TorchConv(features=num_features // 2, kernel_size=2, stride=2, **kw)(
                    nn.relu(bn(t))
                )
                num_features //= 2

        cat = jnp.concatenate(ups + [stem], axis=-1)
        cat = nn.relu(bn(cat))
        logits = TorchConv(features=self.classes, kernel_size=1, **kw)(cat)
        return logits.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            classes=config.out_classes,
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
