"""DeepLabV3 with a ResNet-101 (deep-stem, dilated layer4) backbone.

Capability parity with the reference's ``DeepLabV3``
(/root/reference/models/two_d/deeplab.py:200-215): 3x3x3 deep stem
(conv s2 + conv + conv to 128ch), maxpool k3s2p1, bottleneck layers
[3,4,23,3] with dilation [1,1,1,2], ASPP at rates (6,12,18) with global
pooling branch (:127-197), 1x1 classifier, bilinear align_corners upsample
to input size.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import TorchConv, max_pool
from ...nn.norm import BatchNorm


def _bilinear_resize_align_corners(x, size):
    from ...nn.blocks import resize_linear_align_corners

    return resize_linear_align_corners(x, size)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        out = nn.relu(bn(TorchConv(features=self.planes, kernel_size=1, use_bias=False, **kw)(x)))
        out = nn.relu(bn(TorchConv(
            features=self.planes, kernel_size=3, stride=self.stride,
            padding=self.dilation, dilation=self.dilation, use_bias=False, **kw,
        )(out)))
        out = bn(TorchConv(features=self.planes * 4, kernel_size=1, use_bias=False, **kw)(out))
        residual = x
        if self.downsample:
            residual = bn(TorchConv(
                features=self.planes * 4, kernel_size=1, stride=self.stride,
                use_bias=False, **kw,
            )(x))
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """Deep-stem dilated ResNet (reference deeplab.py:61-117)."""

    layers: Sequence[int] = (3, 4, 23, 3)
    dilation: Sequence[int] = (1, 1, 1, 2)
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        x = nn.relu(bn(TorchConv(features=64, kernel_size=3, stride=2, padding=1, use_bias=False, **kw)(x)))
        x = nn.relu(bn(TorchConv(features=64, kernel_size=3, padding=1, use_bias=False, **kw)(x)))
        x = nn.relu(bn(TorchConv(features=128, kernel_size=3, padding=1, use_bias=False, **kw)(x)))
        x = max_pool(x, 3, stride=2, padding=1)

        inplanes = 128
        for i, (blocks, dil) in enumerate(zip(self.layers, self.dilation)):
            planes = 64 * (2**i)
            stride = 1 if (i == 0 or dil != 1) else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                need_down = b == 0 and (s != 1 or inplanes != planes * 4)
                x = _Bottleneck(
                    planes=planes, stride=s, dilation=dil, downsample=need_down,
                    init_type=self.init_type, dtype=self.dtype,
                )(x, train)
                inplanes = planes * 4
        return x


class ASPP(nn.Module):
    out_channels: int = 256
    dilation_rates: Sequence[int] = (6, 12, 18)
    hidden_channels: int = 256
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        lrelu = lambda z: nn.leaky_relu(z, negative_slope=0.01)
        h = self.hidden_channels
        branches = [TorchConv(features=h, kernel_size=1, use_bias=False, **kw)(x)]
        for rate in self.dilation_rates:
            branches.append(
                TorchConv(features=h, kernel_size=3, dilation=rate, padding=rate,
                          use_bias=False, **kw)(x)
            )
        out = jnp.concatenate(branches, axis=-1)
        out = lrelu(bn(out))
        out = TorchConv(features=self.out_channels, kernel_size=1, use_bias=False, **kw)(out)

        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = TorchConv(features=h, kernel_size=1, use_bias=False, **kw)(pool)
        pool = lrelu(bn(pool))
        pool = TorchConv(features=self.out_channels, kernel_size=1, use_bias=False, **kw)(pool)
        pool = jnp.tile(pool, (1, x.shape[1], x.shape[2], 1))

        out = out + pool
        return lrelu(bn(out))


class DeepLabV3(nn.Module):
    in_class: int = 1
    class_num: int = 2
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = ResNetBackbone(init_type=self.init_type, dtype=self.dtype)(x, train)
        aspp = ASPP(init_type=self.init_type, dtype=self.dtype)(feats, train)
        pred = TorchConv(features=self.class_num, kernel_size=1,
                         init_type=self.init_type, dtype=self.dtype)(aspp)
        out = _bilinear_resize_align_corners(
            pred.astype(jnp.float32), (x.shape[1], x.shape[2])
        )
        return out

    @classmethod
    def from_config(cls, config):
        return cls(
            in_class=config.in_classes,
            class_num=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
