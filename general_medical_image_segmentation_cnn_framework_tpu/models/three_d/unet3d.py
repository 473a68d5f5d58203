"""3-D U-Net (Çiçek et al.), the framework's flagship model.

Capability parity with the reference's ``UNet3D``
(/root/reference/models/three_d/unet3d.py:9-104): 4-level encoder/decoder,
block = (Conv3d k3 p1 -> BN -> ReLU) x2, MaxPool3d(2) downsampling,
ConvTranspose3d(k2, s2) upsampling, skip concatenation, 1x1x1 head. The
driver builds it with init_features=32 (/root/reference/train.py:331).

TPU-native: NDHWC channels-last so every conv lands on the MXU; all conv +
BN + ReLU triples fuse in XLA; optional bfloat16 compute via ``dtype``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import ConvBlock, TorchConvTranspose, max_pool


class UNet3D(nn.Module):
    in_channels: int = 1
    out_channels: int = 2
    init_features: int = 32
    init_type: str = "none"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False  # rematerialize blocks: trades ~30% FLOPs for
    # activation memory, unlocking larger (MXU-friendlier) batches
    remat_policy: str = ""  # ''/'full' | 'conv' (save conv outputs) | 'dots'
    pallas: bool = False  # route lane-aligned deep blocks through the fused
    # Pallas conv+BN+ReLU kernel (config.pallas_conv)

    def _block(self, features: int, counter):
        block_cls = ConvBlock
        if self.remat:
            from ...nn.blocks import remat_policy as _rp

            block_cls = nn.remat(
                ConvBlock, static_argnums=(2,), policy=_rp(self.remat_policy)
            )
        kw = dict(
            kernel_size=3,
            padding=1,
            norm="batch",
            act="relu",
            init_type=self.init_type,
            dtype=self.dtype,
            axis_name=self.axis_name,
            pallas=self.pallas,
        )

        def block(x, train):
            # explicit names: nn.remat's wrapper class is auto-named
            # "CheckpointConvBlock_i", which would make remat=true
            # checkpoints unloadable by a remat=false model (found by the
            # whole-volume train->predict run). The tree must not depend
            # on the remat flag.
            x = block_cls(
                features=features, **kw, name=f"ConvBlock_{next(counter)}"
            )(x, train)
            x = block_cls(
                features=features, **kw, name=f"ConvBlock_{next(counter)}"
            )(x, train)
            return x

        return block

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.init_features
        counter = iter(range(18))
        up = lambda feats: TorchConvTranspose(
            features=feats, kernel_size=2, stride=2, init_type=self.init_type, dtype=self.dtype
        )

        enc1 = self._block(f, counter)(x, train)
        enc2 = self._block(f * 2, counter)(max_pool(enc1, 2), train)
        enc3 = self._block(f * 4, counter)(max_pool(enc2, 2), train)
        enc4 = self._block(f * 8, counter)(max_pool(enc3, 2), train)

        bottleneck = self._block(f * 16, counter)(max_pool(enc4, 2), train)

        dec4 = up(f * 8)(bottleneck)
        dec4 = self._block(f * 8, counter)(jnp.concatenate([dec4, enc4], axis=-1), train)
        dec3 = up(f * 4)(dec4)
        dec3 = self._block(f * 4, counter)(jnp.concatenate([dec3, enc3], axis=-1), train)
        dec2 = up(f * 2)(dec3)
        dec2 = self._block(f * 2, counter)(jnp.concatenate([dec2, enc2], axis=-1), train)
        dec1 = up(f)(dec2)
        dec1 = self._block(f, counter)(jnp.concatenate([dec1, enc1], axis=-1), train)

        return nn.Conv(
            features=self.out_channels,
            kernel_size=(1, 1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(dec1).astype(jnp.float32)

    @classmethod
    def from_config(cls, config) -> "UNet3D":
        # driver call: UNet3D(config.in_classes, config.out_classes, 32)
        # (/root/reference/train.py:331)
        return cls(
            in_channels=config.in_classes,
            out_channels=config.out_classes,
            init_features=32,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
            remat=bool(getattr(config, "remat", False)),
            remat_policy=str(getattr(config, "remat_policy", "") or ""),
            pallas=bool(getattr(config, "pallas_conv", False)),
        )
