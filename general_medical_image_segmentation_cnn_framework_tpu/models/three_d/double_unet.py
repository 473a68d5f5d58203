"""Double U-Net: coarse-to-fine cascade with SE-gated fine skips.

Capability parity with the reference's ``Double_Unet``
(/root/reference/models/three_d/Double_Unet.py:15-113): a 3-level coarse
U-Net at half width whose logits are concatenated with the input and fed
to a 3-level fine U-Net whose skip connections pass through ``SE_Residual``
channel attention (:100-110); returns the fine output only. Up-convs keep
their channel count (k2 s2, features preserved), giving the 3x concat
widths of the reference.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import ConvBlock, TorchConv, TorchConvTranspose, max_pool
from ...nn.residual import SEResidual


class _UNet3Level(nn.Module):
    features: int
    out_channels: int
    use_se_skips: bool = False
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        f = self.features
        kw = dict(kernel_size=3, padding=1, norm="batch", act="relu",
                  init_type=self.init_type, dtype=self.dtype)
        up = lambda feats: TorchConvTranspose(
            features=feats, kernel_size=2, stride=2,
            init_type=self.init_type, dtype=self.dtype,
        )

        def block(z, feats):
            z = ConvBlock(features=feats, **kw)(z, train)
            return ConvBlock(features=feats, **kw)(z, train)

        def se(z):
            return SEResidual(dtype=self.dtype)(z) if self.use_se_skips else z

        enc1 = block(x, f)
        enc2 = block(max_pool(enc1, 2), f * 2)
        enc3 = block(max_pool(enc2, 2), f * 4)
        bottleneck = block(max_pool(enc3, 2), f * 8)

        dec3 = block(jnp.concatenate([up(f * 8)(bottleneck), se(enc3)], axis=-1), f * 4)
        dec2 = block(jnp.concatenate([up(f * 4)(dec3), se(enc2)], axis=-1), f * 2)
        dec1 = block(jnp.concatenate([up(f * 2)(dec2), se(enc1)], axis=-1), f)
        return TorchConv(
            features=self.out_channels, kernel_size=1,
            init_type=self.init_type, dtype=self.dtype,
        )(dec1)


class DoubleUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 2
    unet_init_features: int = 64
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        coarse = _UNet3Level(
            features=self.unet_init_features // 2,
            out_channels=self.out_channels,
            use_se_skips=False,
            init_type=self.init_type,
            dtype=self.dtype,
        )(x, train)
        fine_in = jnp.concatenate([x, coarse.astype(x.dtype)], axis=-1)
        fine = _UNet3Level(
            features=self.unet_init_features,
            out_channels=self.out_channels,
            use_se_skips=True,
            init_type=self.init_type,
            dtype=self.dtype,
        )(fine_in, train)
        return fine.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            out_channels=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
