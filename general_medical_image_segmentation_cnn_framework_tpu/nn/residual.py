"""Shared HighResNet-family building blocks.

Capability parity with the reference's L3 layer (SURVEY §1):
``ConvolutionalBlock`` (/root/reference/utils/convolution.py:12-74,
pre/post-activation, reflect/replicate/constant padding, dilation),
``ResidualBlock`` (/root/reference/utils/residual.py:11-84, 'pad' zero-pad
or 'project' 1x1 shortcut), ``DilationBlock``
(/root/reference/utils/dilation.py:5-39), and squeeze-excite blocks
(/root/reference/models/three_d/SE.py:4-49). Dimension-generic: rank is
inferred from the input (NHWC or NDHWC).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import TorchConv, global_avg_pool
from .norm import BatchNorm, InstanceNorm

_PAD_MODES = {"constant": "constant", "reflect": "reflect", "replicate": "edge"}


def pad_spatial(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    if pad == 0:
        return x
    n = x.ndim - 2
    pads = [(0, 0)] + [(pad, pad)] * n + [(0, 0)]
    return jnp.pad(x, pads, mode=_PAD_MODES[mode])


class ConvolutionalBlock(nn.Module):
    """(pre|post)-activation Norm/ReLU/Conv with explicit dilation padding."""

    out_channels: int
    dilation: int = 1
    batch_norm: bool = True
    instance_norm: bool = False
    norm_affine: bool = True
    padding_mode: str = "constant"
    preactivation: bool = True
    kernel_size: int = 3
    activation: bool = True
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert not (self.batch_norm and self.instance_norm)

        def norm(z):
            if self.batch_norm:
                return BatchNorm(use_running_average=not train, dtype=self.dtype)(z)
            if self.instance_norm:
                return InstanceNorm(affine=self.norm_affine, dtype=self.dtype)(z)
            return z

        y = x
        if self.preactivation:
            y = norm(y)
            if self.activation:
                y = nn.relu(y)
        if self.kernel_size > 1:
            y = pad_spatial(y, self.dilation, self.padding_mode)
        use_bias = not (self.batch_norm or self.instance_norm)
        y = TorchConv(
            features=self.out_channels,
            kernel_size=self.kernel_size,
            padding=0,
            dilation=self.dilation,
            use_bias=use_bias,
            init_type=self.init_type,
            dtype=self.dtype,
        )(y)
        if not self.preactivation:
            y = norm(y)
            if self.activation:
                y = nn.relu(y)
        return y


class ResidualBlock(nn.Module):
    """num_layers ConvolutionalBlocks + identity ('pad') or 1x1 ('project')
    shortcut when channels change (reference residual.py:59-83)."""

    out_channels: int
    num_layers: int = 2
    dilation: int = 1
    batch_norm: bool = True
    instance_norm: bool = False
    residual: bool = True
    residual_type: str = "pad"
    padding_mode: str = "constant"
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.residual_type in ("pad", "project")
        out = x
        for _ in range(self.num_layers):
            out = ConvolutionalBlock(
                out_channels=self.out_channels,
                dilation=self.dilation,
                batch_norm=self.batch_norm,
                instance_norm=self.instance_norm,
                padding_mode=self.padding_mode,
                init_type=self.init_type,
                dtype=self.dtype,
            )(out, train)
        if self.residual:
            shortcut = x
            if x.shape[-1] != self.out_channels:
                if self.residual_type == "project":
                    shortcut = TorchConv(
                        features=self.out_channels, kernel_size=1,
                        dilation=self.dilation, use_bias=False,
                        init_type=self.init_type, dtype=self.dtype,
                    )(x)
                else:  # 'pad': zero channels split half before / half after
                    diff = self.out_channels - x.shape[-1]
                    half = diff // 2
                    zeros_shape = x.shape[:-1]
                    pre = jnp.zeros(zeros_shape + (half,), x.dtype)
                    post = jnp.zeros(zeros_shape + (diff - half,), x.dtype)
                    shortcut = jnp.concatenate([pre, x, post], axis=-1)
            out = shortcut + out
        return out


class DilationBlock(nn.Module):
    """num_residual_blocks ResidualBlocks at one dilation factor
    (reference dilation.py:5-39)."""

    out_channels: int
    dilation: int = 1
    layers_per_block: int = 2
    num_residual_blocks: int = 3
    batch_norm: bool = True
    instance_norm: bool = False
    residual: bool = True
    padding_mode: str = "constant"
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.num_residual_blocks):
            x = ResidualBlock(
                out_channels=self.out_channels,
                num_layers=self.layers_per_block,
                dilation=self.dilation,
                batch_norm=self.batch_norm,
                instance_norm=self.instance_norm,
                residual=self.residual,
                padding_mode=self.padding_mode,
                init_type=self.init_type,
                dtype=self.dtype,
            )(x, train)
        return x


class SEInception(nn.Module):
    """Squeeze-excite: x * sigmoid(FC(relu(FC(GAP(x))))) (reference SE.py:4-25)."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = global_avg_pool(x)  # [B, 1.., C]
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y)
        return x * y


class SEResidual(nn.Module):
    """x + x * scale (reference SE.py:28-49)."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = global_avg_pool(x)
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y)
        return x + x * y
