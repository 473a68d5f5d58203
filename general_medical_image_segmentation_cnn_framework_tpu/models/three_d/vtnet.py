"""VT-UNet driver wrapper.

Capability parity with the reference's ``VTUNet``
(/root/reference/models/three_d/vtnet.py:12-46): SwinTransformerSys3D with
embed_dim 96, depths [2,2,2,1], heads [3,6,12,24], window 7^3, patch 4^3,
drop_path 0.1. The reference hardcodes img_size=(128,128,128); we wire
``config.patch_size`` so the model composes with any patch setting (the
reference's registry only trains vtnet and cannot predict it — SURVEY
§2.8 drift — here it does both).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .vt_unet import SwinTransformerSys3D


class VTUNet(nn.Module):
    num_classes: int = 2
    input_dim: int = 1
    embed_dim: int = 96
    win_size: int = 7
    img_size: Tuple[int, int, int] = (128, 128, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return SwinTransformerSys3D(
            img_size=self.img_size,
            patch_size=(4, 4, 4),
            in_chans=self.input_dim,
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            depths=(2, 2, 2, 1),
            num_heads=(3, 6, 12, 24),
            window_size=(self.win_size,) * 3,
            mlp_ratio=4.0,
            qkv_bias=True,
            drop_rate=0.0,
            attn_drop_rate=0.0,
            drop_path_rate=0.1,
            patch_norm=True,
            dtype=self.dtype,
        )(x, train)

    @classmethod
    def from_config(cls, config):
        return cls(
            num_classes=config.out_classes,
            input_dim=config.in_classes,
            img_size=tuple(config.patch_size),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
