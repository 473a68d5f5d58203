"""PSPNet (Zhao et al. 2017) with a dilated ResNet-34 backbone.

Capability parity with the reference's ``PSPNet``
(/root/reference/models/two_d/pspnet.py:174-215): ResNet-34 backbone
(BasicBlock [3,4,6,3], conv7 s2 stem, layer3/4 dilated 2/4 at stride 1),
PSP pooling module with adaptive-average pyramid sizes (1,2,3,6)
(:139-156), three PSPUpsample (bilinear x2 + conv-BN-PReLU) stages with
dropout 0.3/0.15, and a 1x1 + LogSoftmax head (:191-194).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import PReLU, TorchConv, max_pool, resize_linear
from ...nn.norm import BatchNorm


def adaptive_avg_pool2d(x, out_size: int):
    """torch AdaptiveAvgPool2d semantics: segment boundaries floor/ceil."""
    b, h, w, c = x.shape

    def pool_axis(z, size, axis):
        length = z.shape[axis]
        segs = []
        for i in range(size):
            start = (i * length) // size
            end = -(-((i + 1) * length) // size)
            sl = [slice(None)] * z.ndim
            sl[axis] = slice(start, end)
            segs.append(jnp.mean(z[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(segs, axis=axis)

    return pool_axis(pool_axis(x, out_size, 1), out_size, 2)


class _BasicBlock(nn.Module):
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
        out = nn.relu(bn(TorchConv(
            features=self.planes, kernel_size=3, stride=self.stride,
            padding=self.dilation, dilation=self.dilation, use_bias=False, **kw,
        )(x)))
        out = bn(TorchConv(
            features=self.planes, kernel_size=3, padding=self.dilation,
            dilation=self.dilation, use_bias=False, **kw,
        )(out))
        residual = x
        if self.downsample:
            residual = bn(TorchConv(
                features=self.planes, kernel_size=1, stride=self.stride,
                use_bias=False, **kw,
            )(x))
        return nn.relu(out + residual)


class _ResNet34Dilated(nn.Module):
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        x = TorchConv(features=64, kernel_size=7, stride=2, padding=3, use_bias=False, **kw)(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = max_pool(x, 3, stride=2, padding=1)
        inplanes = 64
        for planes, blocks, stride, dilation in (
            (64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 1, 2), (512, 3, 1, 4)
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                d = 1 if b == 0 else dilation  # first block of a stage runs dil 1
                need_down = b == 0 and (s != 1 or inplanes != planes)
                x = _BasicBlock(
                    planes=planes, stride=s, dilation=d, downsample=need_down,
                    init_type=self.init_type, dtype=self.dtype,
                )(x, train)
                inplanes = planes
        return x


class PSPNet(nn.Module):
    in_class: int = 1
    n_classes: int = 2
    sizes: Sequence[int] = (1, 2, 3, 6)
    psp_size: int = 512
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(init_type=self.init_type, dtype=self.dtype)
        f = _ResNet34Dilated(self.init_type, self.dtype)(x, train)

        h, w = f.shape[1], f.shape[2]
        priors = []
        for size in self.sizes:
            p = adaptive_avg_pool2d(f, size)
            p = TorchConv(features=self.psp_size, kernel_size=1, use_bias=False, **kw)(p)
            priors.append(resize_linear(p, shape=(h, w)))
        priors.append(f)
        p = TorchConv(features=1024, kernel_size=1, **kw)(
            jnp.concatenate(priors, axis=-1)
        )
        p = nn.relu(p)
        p = nn.Dropout(rate=0.3, deterministic=not train)(p)

        def psp_up(z, feats):
            z = resize_linear(z, 2)
            z = TorchConv(features=feats, kernel_size=3, padding=1, **kw)(z)
            z = BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
            return PReLU()(z)

        p = psp_up(p, 256)
        p = nn.Dropout(rate=0.15, deterministic=not train)(p)
        p = psp_up(p, 64)
        p = nn.Dropout(rate=0.15, deterministic=not train)(p)
        p = psp_up(p, 64)
        p = nn.Dropout(rate=0.15, deterministic=not train)(p)

        logits = TorchConv(features=self.n_classes, kernel_size=1, **kw)(p)
        return nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_class=config.in_classes,
            n_classes=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
