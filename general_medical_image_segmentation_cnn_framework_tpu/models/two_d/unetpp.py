"""UNet++ with a ResNet-34 encoder.

Capability parity with the reference's ``ResNet34UnetPlus``
(/root/reference/models/two_d/unetpp.py:84-233): ResNet-34 encoder (the
reference instantiates torchvision's resnet34 unpretrained — rebuilt here
natively), nested dense decoder grid x_{i,j} of 3-conv DecoderBlocks,
nearest x2 upsizing, learnable 5-way ``mix`` logit blend (:101-102,229),
bilinear align_corners=False final resize. The reference's stray debug
``print``s (:204,209,228) are of course not replicated.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import TorchConv, max_pool, resize_linear, resize_nearest
from ...nn.norm import BatchNorm


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        out = nn.relu(bn(TorchConv(features=self.planes, kernel_size=3, stride=self.stride,
                                   padding=1, use_bias=False, **kw)(x)))
        out = bn(TorchConv(features=self.planes, kernel_size=3, padding=1, use_bias=False, **kw)(out))
        residual = x
        if self.downsample:
            residual = bn(TorchConv(features=self.planes, kernel_size=1, stride=self.stride,
                                    use_bias=False, **kw)(x))
        return nn.relu(out + residual)


class _DecoderBlock(nn.Module):
    out_channels: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        x = jnp.concatenate(xs, axis=-1)
        half = self.out_channels // 2
        x = nn.relu(bn(TorchConv(features=half, kernel_size=3, padding=1, use_bias=False, **kw)(x)))
        x = nn.relu(bn(TorchConv(features=half, kernel_size=3, padding=1, use_bias=False, **kw)(x)))
        x = nn.relu(bn(TorchConv(features=self.out_channels, kernel_size=3, padding=1, use_bias=False, **kw)(x)))
        return x


class UNetPlusPlus(nn.Module):
    num_channels: int = 1
    num_class: int = 2
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
        H, W = x.shape[1], x.shape[2]

        # ResNet-34 stem + encoder
        y = TorchConv(features=64, kernel_size=7, stride=2, padding=3, use_bias=False, **kw)(x)
        x_ = nn.relu(bn(y))
        y = max_pool(x_, 3, stride=2, padding=1)
        inplanes = 64
        encoders = []
        for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)):
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes)
                y = _BasicBlock(planes=planes, stride=s, downsample=down,
                                init_type=self.init_type, dtype=self.dtype)(y, train)
                inplanes = planes
            encoders.append(y)
        e1, e2, e3, e4 = encoders

        dec = lambda f: _DecoderBlock(f, self.init_type, self.dtype)
        up = resize_nearest

        x0_0, x1_0, x2_0, x3_0, x4_0 = x_, e1, e2, e3, e4
        x0_1 = dec(64)([x0_0, up(x1_0)], train)
        x1_1 = dec(64)([x1_0, up(x2_0)], train)
        x0_2 = dec(64)([x0_0, x0_1, up(x1_1)], train)
        x2_1 = dec(128)([x2_0, up(x3_0)], train)
        x1_2 = dec(128)([x1_0, x1_1, up(x2_1)], train)
        x0_3 = dec(128)([x0_0, x0_1, x0_2, up(x1_2)], train)
        x3_1 = dec(256)([x3_0, up(x4_0)], train)
        x2_2 = dec(256)([x2_0, x2_1, up(x3_1)], train)
        x1_3 = dec(256)([x1_0, x1_1, x1_2, up(x2_2)], train)
        x0_4 = dec(256)([x0_0, x0_1, x0_2, x0_3, up(x1_3)], train)

        head = lambda z: TorchConv(features=self.num_class, kernel_size=1, **kw)(z)
        logit1, logit2, logit3, logit4 = head(x0_1), head(x0_2), head(x0_3), head(x0_4)

        mix = self.param("mix", nn.initializers.ones, (5,), jnp.float32)
        logit = (
            mix[1] * logit1 + mix[2] * logit2 + mix[3] * logit3 + mix[4] * logit4
        )
        return resize_linear(logit.astype(jnp.float32), shape=(H, W))

    @classmethod
    def from_config(cls, config):
        return cls(
            num_channels=config.in_classes,
            num_class=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
