"""V-Net (Milletari et al. 2016).

Capability parity with the reference's ``VNet``
(/root/reference/models/three_d/vnet3d.py:124-158): 5x5x5 convs with BN,
ELU (default) or PReLU activations, InputTransition adding the
channel-repeated input as a residual (:53-58), strided k2s2 down-convs,
ConvTranspose k2s2 up-convs with skip concatenation, elementwise-add
residuals in every transition, and the driver default
``VNet(elu=True, in_channels, classes)``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import PReLU, TorchConv, TorchConvTranspose
from ...nn.norm import BatchNorm


class _Act(nn.Module):
    elu: bool = True
    nchan: int = 1

    @nn.compact
    def __call__(self, x):
        if self.elu:
            return nn.elu(x)
        return PReLU(num_parameters=self.nchan)(x)


class _LUConv(nn.Module):
    nchan: int
    elu: bool
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = TorchConv(
            features=self.nchan, kernel_size=5, padding=2,
            init_type=self.init_type, dtype=self.dtype,
        )(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return _Act(self.elu, self.nchan)(y)


class _NConvs(nn.Module):
    nchan: int
    depth: int
    elu: bool
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.depth):
            x = _LUConv(self.nchan, self.elu, self.init_type, self.dtype)(x, train)
        return x


class VNet(nn.Module):
    elu: bool = True
    in_channels: int = 1
    classes: int = 2
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)

        # InputTransition: conv5 -> BN, add channel-repeated input, act
        out = TorchConv(features=16, kernel_size=5, padding=2, **kw)(x)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        repeat_rate = 16 // self.in_channels
        x16 = jnp.tile(x, (1, 1, 1, 1, repeat_rate))
        out16 = _Act(self.elu, 16)(out + x16)

        def down(z, in_chans, n_convs):
            out_chans = 2 * in_chans
            d = TorchConv(features=out_chans, kernel_size=2, stride=2, **kw)(z)
            d = BatchNorm(use_running_average=not train, dtype=self.dtype)(d)
            d = _Act(self.elu, out_chans)(d)
            o = _NConvs(out_chans, n_convs, self.elu, self.init_type, self.dtype)(d, train)
            return _Act(self.elu, out_chans)(o + d)

        out32 = down(out16, 16, 1)
        out64 = down(out32, 32, 2)
        out128 = down(out64, 64, 3)
        out256 = down(out128, 128, 2)

        def up(z, skip, out_chans, n_convs):
            u = TorchConvTranspose(
                features=out_chans // 2, kernel_size=2, stride=2, **kw
            )(z)
            u = BatchNorm(use_running_average=not train, dtype=self.dtype)(u)
            u = _Act(self.elu, out_chans // 2)(u)
            # UpTransition applies nn.Dropout3d() (p=0.5, whole channels) to
            # the skip input unconditionally during training (reference
            # vnet3d.py:90,99 'self.do2 = nn.Dropout3d()' on skipx).
            skip = nn.Dropout(
                rate=0.5, broadcast_dims=(1, 2, 3), deterministic=not train
            )(skip)
            xcat = jnp.concatenate([u, skip], axis=-1)
            o = _NConvs(out_chans, n_convs, self.elu, self.init_type, self.dtype)(xcat, train)
            return _Act(self.elu, out_chans)(o + xcat)

        out = up(out256, out128, 256, 2)
        out = up(out, out64, 128, 2)
        out = up(out, out32, 64, 1)
        out = up(out, out16, 32, 1)

        # OutputTransition: conv5 -> BN -> act -> conv1
        out = TorchConv(features=self.classes, kernel_size=5, padding=2, **kw)(out)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        out = _Act(self.elu, self.classes)(out)
        out = TorchConv(features=self.classes, kernel_size=1, **kw)(out)
        return out.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        # driver call: VNet(elu=True, in_channels, classes) (train.py:334-ish)
        return cls(
            elu=True,
            in_channels=config.in_classes,
            classes=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
