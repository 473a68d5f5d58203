"""SegNet (Badrinarayanan et al. 2017).

Capability parity with the reference's ``SegNet``
(/root/reference/models/two_d/segnet.py:7-134): VGG16 encoder (2-2-3-3-3
conv-BN-ReLU stages), max pooling with indices, and a mirrored decoder
using max-unpooling via the recorded pooling positions.

TPU-first: torch's integer pooling indices become a one-hot window mask
(pure reshape/select — no gathers), see nn.blocks.max_pool_with_mask.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import ConvBlock, TorchConv, max_pool_with_mask, max_unpool_with_mask


class SegNet(nn.Module):
    input_nbr: int = 1
    label_nbr: int = 2
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        cb = lambda f: ConvBlock(
            features=f, kernel_size=3, padding=1, norm="batch", act="relu",
            init_type=self.init_type, dtype=self.dtype,
        )

        masks = []
        y = x
        for feats, n_convs in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
            for _ in range(n_convs):
                y = cb(feats)(y, train)
            y, mask = max_pool_with_mask(y)
            masks.append(mask)

        for feats_list in ((512, 512, 512), (512, 512, 256), (256, 256, 128), (128, 64)):
            y = max_unpool_with_mask(y, masks.pop())
            for feats in feats_list:
                y = cb(feats)(y, train)

        y = max_unpool_with_mask(y, masks.pop())
        y = cb(64)(y, train)
        out = TorchConv(features=self.label_nbr, kernel_size=3, padding=1,
                        init_type=self.init_type, dtype=self.dtype)(y)
        return out.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            input_nbr=config.in_classes,
            label_nbr=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
