"""CSR-Net: U-Net with cross-scale residual paths.

Capability parity with the reference's ``CSRNet``
(/root/reference/models/three_d/csrnet.py:6-154): the 4-level BN-ReLU
U-Net backbone plus stride-4 conv skip-encoders ``_block_r`` (k3 s4 p0,
added into deeper encoder outputs, forward :55-64) and stride-4
ConvTranspose decoder shortcuts ``_block_rr`` (k4 s4, added into shallower
decoder inputs, :70-76).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import ConvBlock, TorchConv, TorchConvTranspose, max_pool
from ...nn.norm import BatchNorm


class CSRNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 2
    init_features: int = 64
    init_type: str = "none"
    dtype: Any = jnp.float32

    def _kw(self):
        return dict(init_type=self.init_type, dtype=self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.init_features
        kw = self._kw()

        def block(z, feats):
            z = ConvBlock(features=feats, kernel_size=3, padding=1, norm="batch",
                          act="relu", **kw)(z, train)
            return ConvBlock(features=feats, kernel_size=3, padding=1, norm="batch",
                             act="relu", **kw)(z, train)

        def block_r(z, feats):
            z = TorchConv(features=feats, kernel_size=3, stride=4, padding=0, **kw)(z)
            z = BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
            return nn.relu(z)

        def block_rr(z, feats):
            z = TorchConvTranspose(features=feats, kernel_size=4, stride=4, **kw)(z)
            z = BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
            return nn.relu(z)

        up = lambda feats: TorchConvTranspose(features=feats, kernel_size=2, stride=2, **kw)

        enc1 = block(x, f)
        enc2 = block(max_pool(enc1, 2), f * 2)
        enc3 = block(max_pool(enc2, 2), f * 4)
        enc3 = enc3 + block_r(enc1, f * 4)
        enc4 = block(max_pool(enc3, 2), f * 8)
        enc4 = enc4 + block_r(enc2, f * 8)

        bottleneck = block(max_pool(enc4, 2), f * 16)
        bottleneck = bottleneck + block_r(enc3, f * 16)

        dec4 = up(f * 8)(bottleneck)
        dec4 = block(jnp.concatenate([dec4, enc4], axis=-1), f * 8)
        dec3 = up(f * 4)(dec4)
        dec3 = block(
            jnp.concatenate([dec3 + block_rr(bottleneck, f * 4), enc3], axis=-1), f * 4
        )
        dec2 = up(f * 2)(dec3)
        dec2 = block(
            jnp.concatenate([dec2 + block_rr(dec4, f * 2), enc2], axis=-1), f * 2
        )
        dec1 = up(f)(dec2)
        dec1 = block(
            jnp.concatenate([dec1 + block_rr(dec3, f), enc1], axis=-1), f
        )
        return TorchConv(features=self.out_channels, kernel_size=1, **kw)(dec1).astype(
            jnp.float32
        )

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            out_channels=config.out_classes,
            init_features=32,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
