"""2-D U-Net (milesial-style).

Capability parity with the reference's ``Unet``
(/root/reference/models/two_d/unet.py:79-115): DoubleConv (conv-BN-ReLU x2)
blocks, maxpool downs to 64/128/256/512/512, bilinear ``Upsample(scale 2,
align_corners=True)`` ups with pad-to-match (:56-65), skip concatenation,
1x1 head. The 2-D zoo is not reachable from the reference's driver
registries (SURVEY §2.4) — here every 2-D net is registered.

2-D inputs are NHWC: [B, H, W, C]. The drivers treat 2-D models via
patch_size of length 2 (library-level capability).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import ConvBlock, TorchConv, max_pool


def _bilinear_up2_align_corners(x):
    """torch Upsample(scale_factor=2, mode='bilinear', align_corners=True)."""
    from ...nn.blocks import resize_linear_align_corners

    return resize_linear_align_corners(x, (2 * x.shape[1], 2 * x.shape[2]))


class UNet2D(nn.Module):
    in_channels: int = 1
    classes: int = 2
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(kernel_size=3, padding=1, norm="batch", act="relu",
                  init_type=self.init_type, dtype=self.dtype)

        def double_conv(z, feats):
            z = ConvBlock(features=feats, **kw)(z, train)
            return ConvBlock(features=feats, **kw)(z, train)

        def up(x1, x2, feats):
            x1 = _bilinear_up2_align_corners(x1)
            dh = x2.shape[1] - x1.shape[1]
            dw = x2.shape[2] - x1.shape[2]
            x1 = jnp.pad(
                x1,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
            return double_conv(jnp.concatenate([x2, x1], axis=-1), feats)

        x1 = double_conv(x, 64)
        x2 = double_conv(max_pool(x1, 2), 128)
        x3 = double_conv(max_pool(x2, 2), 256)
        x4 = double_conv(max_pool(x3, 2), 512)
        x5 = double_conv(max_pool(x4, 2), 512)
        y = up(x5, x4, 256)
        y = up(y, x3, 128)
        y = up(y, x2, 64)
        y = up(y, x1, 64)
        out = TorchConv(features=self.classes, kernel_size=1,
                        init_type=self.init_type, dtype=self.dtype)(y)
        return out.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            classes=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
