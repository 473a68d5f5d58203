"""RE-Net: reverse-attention residual encoder + plain concat decoder.

Capability parity with the reference's ``RE_Net``
(/root/reference/models/three_d/RE_net.py:79-158): the same reverse-
attention encoder as ER-Net but a plain two-conv decoder over concatenated
features (:57-71), hardcoded 1-in/2-out channels (:84,107) and a final
sigmoid (:157) — both reproduced faithfully (SURVEY §2.8).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import TorchConv, TorchConvTranspose, max_pool
from ...nn.norm import BatchNorm
from .er_net import ResEncoder


class RENet(nn.Module):
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        enc = lambda feats: ResEncoder(feats, self.init_type, self.dtype)
        deconv = lambda feats: TorchConvTranspose(features=feats, kernel_size=2, stride=2, **kw)
        conv1 = lambda: TorchConv(features=1, kernel_size=1, **kw)
        trans1 = lambda: TorchConvTranspose(features=1, kernel_size=2, stride=2, **kw)

        def decoder(z, feats):
            bn = lambda t: BatchNorm(use_running_average=not train, dtype=self.dtype)(t)
            z = nn.relu(bn(TorchConv(features=feats, kernel_size=3, padding=1, **kw)(z)))
            return nn.relu(bn(TorchConv(features=feats, kernel_size=3, padding=1, **kw)(z)))

        enc1 = enc(32)(x, train)
        down1 = max_pool(enc1, 2)
        enc2 = enc(64)(down1, train)
        down2 = max_pool(enc2, 2)

        g3 = trans1()(conv1()(enc2))
        x3 = (1.0 - nn.sigmoid(g3)) * enc1 + enc1

        enc3 = enc(128)(down2, train)
        down3 = max_pool(enc3, 2)

        g2 = trans1()(conv1()(enc3))
        x2 = (1.0 - nn.sigmoid(g2)) * enc2 + enc2

        bridge = enc(256)(down3, train)
        g1 = trans1()(conv1()(bridge))
        x1 = (1.0 - nn.sigmoid(g1)) * enc3 + enc3

        up3 = deconv(128)(bridge)
        dec3 = decoder(jnp.concatenate([up3, x1], axis=-1), 128)
        up2 = deconv(64)(dec3)
        dec2 = decoder(jnp.concatenate([up2, x2], axis=-1), 64)
        up1 = deconv(32)(dec2)
        dec1 = decoder(jnp.concatenate([up1, x3], axis=-1), 32)

        final = TorchConv(features=2, kernel_size=1, **kw)(dec1)
        # reference applies F.sigmoid to the 2-channel output (:157)
        return nn.sigmoid(final).astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        # driver passes no args (reference train.py:339); channels hardcoded
        return cls(
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
