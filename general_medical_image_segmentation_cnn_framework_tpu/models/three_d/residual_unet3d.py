"""Residual 3-D U-Net (Isensee 2017-style context/localization net).

Capability parity with the reference's ``UNet``
(/root/reference/models/three_d/residual_unet3d.py:6-205): InstanceNorm +
LeakyReLU everywhere, Dropout3d(p=0.6), strided-conv downsampling, nearest
upsample + conv upscaling, residual (elementwise-add) context blocks, and
deep supervision via two 1x1x1 heads summed after upscaling. The driver
builds it with base_n_filter=32 (/root/reference/train.py:327).

Faithfully reproduced quirks (SURVEY §2.8 parity checklist):
* each context level applies the SAME ``norm_lrelu_conv`` twice (weight
  sharing in the reference, residual_unet3d.py:131-137);
* level-1 takes its skip BEFORE the instance norm (``context_1``,
  reference forward :119-124).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import TorchConv, resize_nearest
from ...nn.norm import InstanceNorm

_LRELU = lambda x: nn.leaky_relu(x, negative_slope=0.01)


class _NormLReluConv(nn.Module):
    features: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = InstanceNorm(dtype=self.dtype)(x)
        y = _LRELU(y)
        return TorchConv(
            features=self.features, kernel_size=3, stride=1, padding=1,
            use_bias=False, init_type=self.init_type, dtype=self.dtype,
        )(y)


class _ConvNormLRelu(nn.Module):
    features: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = TorchConv(
            features=self.features, kernel_size=3, stride=1, padding=1,
            use_bias=False, init_type=self.init_type, dtype=self.dtype,
        )(x)
        y = InstanceNorm(dtype=self.dtype)(y)
        return _LRELU(y)


class _NormLReluUpscaleConvNormLRelu(nn.Module):
    features: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = InstanceNorm(dtype=self.dtype)(x)
        y = _LRELU(y)
        y = resize_nearest(y, 2)
        y = TorchConv(
            features=self.features, kernel_size=3, stride=1, padding=1,
            use_bias=False, init_type=self.init_type, dtype=self.dtype,
        )(y)
        y = InstanceNorm(dtype=self.dtype)(y)
        return _LRELU(y)


class ResidualUNet3D(nn.Module):
    in_channels: int = 1
    n_classes: int = 2
    base_n_filter: int = 32
    dropout_rate: float = 0.6
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.base_n_filter
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        conv = lambda feats, stride=1, k=3, p=1: TorchConv(
            features=feats, kernel_size=k, stride=stride, padding=p,
            use_bias=False, **kw,
        )
        drop = nn.Dropout(rate=self.dropout_rate, deterministic=not train)

        # Level 1 context
        out = conv(f)(x)
        residual_1 = out
        out = _LRELU(out)
        out = conv(f)(out)
        out = drop(out)
        out = _LRELU(out)
        out = conv(f)(out)
        out = out + residual_1
        context_1 = _LRELU(out)  # skip taken pre-norm (reference :124)
        out = InstanceNorm(dtype=self.dtype)(out)
        out = _LRELU(out)

        # Levels 2-4 context (shared norm_lrelu_conv applied twice)
        contexts = []
        for level in range(3):
            feats = f * (2 ** (level + 1))
            out = conv(feats, stride=2)(out)
            residual = out
            shared = _NormLReluConv(features=feats, **kw)
            out = shared(out)
            out = drop(out)
            out = shared(out)  # same weights twice (reference :131-137)
            out = out + residual
            out = InstanceNorm(dtype=self.dtype)(out)
            out = _LRELU(out)
            contexts.append(out)
        context_2, context_3, context_4 = contexts

        # Level 5 bottleneck
        out = conv(f * 16, stride=2)(out)
        residual_5 = out
        shared5 = _NormLReluConv(features=f * 16, **kw)
        out = shared5(out)
        out = drop(out)
        out = shared5(out)
        out = out + residual_5
        out = _NormLReluUpscaleConvNormLRelu(features=f * 8, **kw)(out)

        out = conv(f * 8, k=1, p=0)(out)
        out = InstanceNorm(dtype=self.dtype)(out)
        out = _LRELU(out)

        # Localization pathway
        out = jnp.concatenate([out, context_4], axis=-1)
        out = _ConvNormLRelu(features=f * 16, **kw)(out)
        out = conv(f * 8, k=1, p=0)(out)
        out = _NormLReluUpscaleConvNormLRelu(features=f * 4, **kw)(out)

        out = jnp.concatenate([out, context_3], axis=-1)
        out = _ConvNormLRelu(features=f * 8, **kw)(out)
        ds2 = out
        out = conv(f * 4, k=1, p=0)(out)
        out = _NormLReluUpscaleConvNormLRelu(features=f * 2, **kw)(out)

        out = jnp.concatenate([out, context_2], axis=-1)
        out = _ConvNormLRelu(features=f * 4, **kw)(out)
        ds3 = out
        out = conv(f * 2, k=1, p=0)(out)
        out = _NormLReluUpscaleConvNormLRelu(features=f, **kw)(out)

        out = jnp.concatenate([out, context_1], axis=-1)
        out = _ConvNormLRelu(features=f * 2, **kw)(out)
        out_pred = conv(self.n_classes, k=1, p=0)(out)

        # Deep supervision (reference :196-202)
        ds2_conv = conv(self.n_classes, k=1, p=0)(ds2)
        ds2_up = resize_nearest(ds2_conv, 2)
        ds3_conv = conv(self.n_classes, k=1, p=0)(ds3)
        ds_sum_up = resize_nearest(ds2_up + ds3_conv, 2)

        return (out_pred + ds_sum_up).astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        # driver call: UNet(in_channels, n_classes, base_n_filter=32)
        # (/root/reference/train.py:327)
        return cls(
            in_channels=config.in_classes,
            n_classes=config.out_classes,
            base_n_filter=32,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
