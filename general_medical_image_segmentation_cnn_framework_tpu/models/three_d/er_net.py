"""ER-Net: reverse-attention residual encoder + selective-fusion decoder.

Capability parity with the reference's ``ER_Net``
(/root/reference/models/three_d/ER_net.py:155-231): ResEncoder blocks
(conv-BN-ReLU x2 + 1x1 residual), reverse-attention gates
``x = (1 - sigmoid(upsampled 1-ch conv)) * enc + enc`` (:191-213), and the
SK-style SFConv selective fusion decoder (:57-132). Constructor signature
``ER_Net(classes, channels)`` as dispatched by the driver.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import TorchConv, TorchConvTranspose, max_pool
from ...nn.norm import BatchNorm


class ResEncoder(nn.Module):
    out_channels: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        residual = TorchConv(features=self.out_channels, kernel_size=1, **kw)(x)
        out = nn.relu(bn(TorchConv(features=self.out_channels, kernel_size=3, padding=1, **kw)(x)))
        out = nn.relu(bn(TorchConv(features=self.out_channels, kernel_size=3, padding=1, **kw)(out)))
        return nn.relu(out + residual)


class SFConv(nn.Module):
    """Selective-kernel fusion of two branches (reference SFConv:57-109)."""

    features: int
    M: int = 2
    r: int = 4
    L: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        d = max(self.features // self.r, self.L)
        feas = jnp.stack([x1, x2], axis=1)  # [B, M, D, H, W, C]
        fea_u = jnp.sum(feas, axis=1)
        fea_s = jnp.mean(fea_u, axis=(1, 2, 3))  # [B, C]
        fea_z = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32)(fea_s)
        vectors = [
            nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(fea_z)
            for _ in range(self.M)
        ]
        att = jax.nn.softmax(jnp.stack(vectors, axis=1), axis=1)  # [B, M, C]
        att = att[:, :, None, None, None, :]
        return jnp.sum(feas * att, axis=1)


class SFDecoder(nn.Module):
    out_channels: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        out = SFConv(features=self.out_channels, dtype=self.dtype)(x1, x2)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        out = nn.relu(out)
        # ResDecoder: two conv-BN-ReLU + 1x1 residual (reference :37-54)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        residual = TorchConv(features=self.out_channels, kernel_size=1, **kw)(out)
        y = nn.relu(bn(TorchConv(features=self.out_channels, kernel_size=3, padding=1, **kw)(out)))
        y = nn.relu(bn(TorchConv(features=self.out_channels, kernel_size=3, padding=1, **kw)(y)))
        return nn.relu(y + residual)


class ERNet(nn.Module):
    classes: int = 2
    channels: int = 1
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        enc = lambda feats: ResEncoder(feats, self.init_type, self.dtype)
        deconv = lambda feats: TorchConvTranspose(features=feats, kernel_size=2, stride=2, **kw)
        conv1 = lambda: TorchConv(features=1, kernel_size=1, **kw)
        trans1 = lambda: TorchConvTranspose(features=1, kernel_size=2, stride=2, **kw)

        enc1 = enc(32)(x, train)
        down1 = max_pool(enc1, 2)
        enc2 = enc(64)(down1, train)
        down2 = max_pool(enc2, 2)

        # reverse-attention gate on enc1 from enc2
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
        dec3 = SFDecoder(128, self.init_type, self.dtype)(up3, x1, train)
        up2 = deconv(64)(dec3)
        dec2 = SFDecoder(64, self.init_type, self.dtype)(up2, x2, train)
        up1 = deconv(32)(dec2)
        dec1 = SFDecoder(32, self.init_type, self.dtype)(up1, x3, train)

        return TorchConv(features=self.classes, kernel_size=1, **kw)(dec1).astype(
            jnp.float32
        )

    @classmethod
    def from_config(cls, config):
        return cls(
            classes=config.out_classes,
            channels=config.in_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
