"""MiniSeg (Qiu et al. 2020): two-path lightweight segmentation net.

Capability parity with the reference's ``MiniSeg``
(/root/reference/models/two_d/miniseg.py:97-265): dual long/down paths with
cross-injections, DilatedParallelConvBlock (4-way depthwise dilations 1/2/4/8
with cascaded adds + grouped attention, :36-72), DownsamplerBlock (1x1 +
depthwise k5, :75-87), per-level cat+split exchange, D2 dilated-parallel
up-blocks, bilinear (align_corners=False) upsampling, optional aux heads.
Default config P1..P4 = (2, 3, 8, 6).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import PReLU, TorchConv, avg_pool, resize_linear
from ...nn.norm import BatchNorm


class _ConvBlock(nn.Module):
    out_planes: int
    stride: int = 1
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = TorchConv(features=self.out_planes, kernel_size=3, stride=self.stride,
                      padding=1, use_bias=False, init_type=self.init_type, dtype=self.dtype)(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return PReLU(num_parameters=self.out_planes)(y)


class _DownsamplerBlock(nn.Module):
    out_planes: int
    stride: int = 2
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        y = TorchConv(features=self.out_planes, kernel_size=1, use_bias=False, **kw)(x)
        y = TorchConv(features=self.out_planes, kernel_size=5, stride=self.stride,
                      padding=2, groups=self.out_planes, use_bias=False, **kw)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return PReLU(num_parameters=self.out_planes)(y)


class _DilatedParallelConvBlock(nn.Module):
    out_planes: int
    stride: int = 1
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        inter = self.out_planes // 4
        y = TorchConv(features=inter, kernel_size=1, use_bias=False, **kw)(x)
        dw = lambda dil: TorchConv(
            features=inter, kernel_size=3, stride=self.stride, padding=dil,
            dilation=dil, groups=inter, use_bias=False, **kw,
        )
        d1 = dw(1)(y)
        d2 = dw(2)(y)
        d3 = dw(4)(y)
        d4 = dw(8)(y)
        p = avg_pool(y, 3, stride=self.stride, padding=1)
        d1 = d1 + p
        d2 = d1 + d2
        d3 = d2 + d3
        d4 = d3 + d4
        cat = jnp.concatenate([d1, d2, d3, d4], axis=-1)
        att = nn.sigmoid(
            TorchConv(features=4, kernel_size=1, groups=4, use_bias=False, **kw)(cat)
        )
        d1 = d1 + d1 * att[..., 0:1]
        d2 = d2 + d2 * att[..., 1:2]
        d3 = d3 + d3 * att[..., 2:3]
        d4 = d4 + d4 * att[..., 3:4]
        out = TorchConv(features=self.out_planes, kernel_size=1, groups=4, use_bias=False, **kw)(
            jnp.concatenate([d1, d2, d3, d4], axis=-1)
        )
        out = BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        return PReLU(num_parameters=self.out_planes)(out)


class _DilatedParallelConvBlockD2(nn.Module):
    out_planes: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        y = TorchConv(features=self.out_planes, kernel_size=1, use_bias=False, **kw)(x)
        d1 = TorchConv(features=self.out_planes, kernel_size=3, padding=1,
                       groups=self.out_planes, use_bias=False, **kw)(y)
        d2 = TorchConv(features=self.out_planes, kernel_size=3, padding=2, dilation=2,
                       groups=self.out_planes, use_bias=False, **kw)(y)
        return BatchNorm(use_running_average=not train, dtype=self.dtype)(d1 + d2)


class MiniSeg(nn.Module):
    in_input: int = 3
    classes: int = 2
    P1: int = 2
    P2: int = 3
    P3: int = 8
    P4: int = 6
    aux: bool = False
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        bn = lambda z: BatchNorm(use_running_average=not train, dtype=self.dtype)(z)

        def level(inp_long, inp_down, feats, P, D, long_cls, down_cls, stride_in):
            long = long_cls(feats, stride=stride_in, init_type=self.init_type, dtype=self.dtype)(inp_long, train)
            out = down_cls(feats, stride=stride_in, init_type=self.init_type, dtype=self.dtype)(inp_down, train)
            out_add = out + long
            for i in range(P):
                layer = down_cls(feats, stride=1, init_type=self.init_type, dtype=self.dtype)
                if i < D:
                    new_out = layer(out_add, train) + out
                    long = _DownsamplerBlock(feats, stride=1, init_type=self.init_type, dtype=self.dtype)(out_add, train) + long
                    out = new_out
                    out_add = out + long
                else:
                    out = layer(out_add, train) + out
                    out_add = out + long
            cat = TorchConv(features=feats * 2, kernel_size=1, use_bias=False, **kw)(
                jnp.concatenate([long, out], axis=-1)
            )
            cat = bn(cat)
            half = feats  # split in halves
            return long, out, cat[..., :half], cat[..., half:]

        make_down = lambda feats, stride, **k: _ConvBlock(feats, stride=stride, **k)
        make_long = lambda feats, stride, **k: _DownsamplerBlock(feats, stride=stride, **k)
        make_dp = lambda feats, stride, **k: _DilatedParallelConvBlock(feats, stride=stride, **k)

        long1, out1, l1, r1 = level(x, x, 8, self.P1, self.P1 // 2, make_long, make_down, 2)
        long2, out2, l2, r2 = level(l1 + long1, r1 + out1, 24, self.P2, self.P2 // 2, make_long, make_dp, 2)
        long3, out3, l3, r3 = level(l2 + long2, r2 + out2, 32, self.P3, self.P3 // 2, make_long, make_dp, 2)
        long4, out4, _, _ = level(l3 + long3, r3 + out3, 64, self.P4, self.P4 // 2, make_long, make_dp, 2)

        up4 = PReLU(64)(bn(TorchConv(features=64, kernel_size=1, **kw)(out4)))
        up4 = resize_linear(up4, shape=out3.shape[1:3])
        up3 = PReLU(32)(
            _DilatedParallelConvBlockD2(32, self.init_type, self.dtype)(up4, train)
            + bn(TorchConv(features=32, kernel_size=1, **kw)(out3))
        )
        up3 = resize_linear(up3, shape=out2.shape[1:3])
        up2 = PReLU(24)(
            _DilatedParallelConvBlockD2(24, self.init_type, self.dtype)(up3, train)
            + bn(TorchConv(features=24, kernel_size=1, **kw)(out2))
        )
        up2 = resize_linear(up2, shape=out1.shape[1:3])
        up1 = PReLU(8)(
            _DilatedParallelConvBlockD2(8, self.init_type, self.dtype)(up2, train)
            + bn(TorchConv(features=8, kernel_size=1, **kw)(out1))
        )

        def pred(z, name_feats):
            z = nn.Dropout(rate=0.01, deterministic=not train)(z)
            z = TorchConv(features=self.classes, kernel_size=1, **kw)(z)
            return resize_linear(z.astype(jnp.float32), shape=x.shape[1:3])

        pred1 = pred(up1, 8)
        if self.aux:
            return pred1, pred(up2, 24), pred(up3, 32), pred(up4, 64)
        return pred1

    @classmethod
    def from_config(cls, config):
        return cls(
            in_input=config.in_classes,
            classes=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
