"""IS-Net: triple-decoder U-Net for integration/separation learning.

Capability parity with the reference's IS variant ``UNet3D``
(/root/reference/models/three_d/IS.py:8-214): ONE shared 4-level encoder
run on the raw input and on the FFT low-/high-pass band-split inputs
(computed by the driver, /root/reference/train.py:198-201 — here in
ops/fft.py), THREE decoder weight sets (plain, ``_``, ``__``), and two
heads: ``out1 = conv(dec1)``, ``out2 = conv_(dec1 + dec1_ + dec1__)``.
The driver trains on ``out1`` (train.py:201).

The reference also allocates a second, never-used encoder set
(``encoder*_``, IS.py:48-76 — dead parameters); we do not replicate dead
weights.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import ConvBlock, TorchConv, TorchConvTranspose, max_pool


class _Encoder(nn.Module):
    features: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        f = self.features
        kw = dict(kernel_size=3, padding=1, norm="batch", act="relu",
                  init_type=self.init_type, dtype=self.dtype)

        def block(z, feats):
            z = ConvBlock(features=feats, **kw)(z, train)
            return ConvBlock(features=feats, **kw)(z, train)

        enc1 = block(x, f)
        enc2 = block(max_pool(enc1, 2), f * 2)
        enc3 = block(max_pool(enc2, 2), f * 4)
        enc4 = block(max_pool(enc3, 2), f * 8)
        bottleneck = block(max_pool(enc4, 2), f * 16)
        return enc1, enc2, enc3, enc4, bottleneck


class _Decoder(nn.Module):
    features: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skips, train: bool):
        enc1, enc2, enc3, enc4, bottleneck = skips
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

        dec4 = block(jnp.concatenate([up(f * 8)(bottleneck), enc4], axis=-1), f * 8)
        dec3 = block(jnp.concatenate([up(f * 4)(dec4), enc3], axis=-1), f * 4)
        dec2 = block(jnp.concatenate([up(f * 2)(dec3), enc2], axis=-1), f * 2)
        dec1 = block(jnp.concatenate([up(f)(dec2), enc1], axis=-1), f)
        return dec1


class ISNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 2
    init_features: int = 32
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, low_x, high_x, train: bool = True):
        encoder = _Encoder(self.init_features, self.init_type, self.dtype)
        dec = _Decoder(self.init_features, self.init_type, self.dtype)(
            encoder(x, train), train
        )
        dec_low = _Decoder(self.init_features, self.init_type, self.dtype)(
            encoder(low_x, train), train
        )
        dec_high = _Decoder(self.init_features, self.init_type, self.dtype)(
            encoder(high_x, train), train
        )
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        out1 = TorchConv(features=self.out_channels, kernel_size=1, **kw)(dec)
        out2 = TorchConv(features=self.out_channels, kernel_size=1, **kw)(
            dec + dec_low + dec_high
        )
        return out1.astype(jnp.float32), out2.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            out_channels=config.out_classes,
            init_features=32,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
