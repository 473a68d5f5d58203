"""FusionNet: parallel U-Net + V-Net with a small CNN fusion head.

Capability parity with the reference's ``FusionNet``
(/root/reference/models/three_d/FusionNet.py:125-228): a full 4-level
U-Net (init_features 64) and a full V-Net run on the same input; their
logits are concatenated and passed through conv-BN-ReLU -> maxpool ->
conv-BN-ReLU -> ConvTranspose k2s2 -> 1x1 head.

Deviation (documented): the reference's fusion stem expects
``in_channels*2`` channels, which crashes unless out_channels ==
in_channels (FusionNet.py:130 vs :222 — it is unregistered and untested
upstream); we size the stem from the actual concatenated logits.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import ConvBlock, TorchConv, TorchConvTranspose, max_pool
from .unet3d import UNet3D
from .vnet3d import VNet


class FusionNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 2
    unet_init_features: int = 64
    cnn_init_features: int = 64
    elu: bool = True
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        unet_out = UNet3D(
            in_channels=self.in_channels, out_channels=self.out_channels,
            init_features=self.unet_init_features,
            init_type=self.init_type, dtype=self.dtype,
        )(x, train)
        vnet_out = VNet(
            elu=self.elu, in_channels=self.in_channels, classes=self.out_channels,
            init_type=self.init_type, dtype=self.dtype,
        )(x, train)

        f = self.cnn_init_features
        y = jnp.concatenate([unet_out.astype(x.dtype), vnet_out.astype(x.dtype)], axis=-1)
        y = ConvBlock(features=f, kernel_size=3, padding=1, norm="batch", act="relu",
                      init_type=self.init_type, dtype=self.dtype)(y, train)
        y = max_pool(y, 2)
        y = ConvBlock(features=f * 2, kernel_size=3, padding=1, norm="batch", act="relu",
                      init_type=self.init_type, dtype=self.dtype)(y, train)
        y = TorchConvTranspose(features=f, kernel_size=2, stride=2,
                               init_type=self.init_type, dtype=self.dtype)(y)
        out = TorchConv(features=self.out_channels, kernel_size=1,
                        init_type=self.init_type, dtype=self.dtype)(y)
        return out.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            out_channels=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
