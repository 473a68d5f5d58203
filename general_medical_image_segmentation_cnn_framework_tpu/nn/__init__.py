"""Shared neural-net building blocks (Flax linen, channels-last NDHWC)."""

from .init import kernel_initializer, bias_initializer
from .norm import BatchNorm, InstanceNorm
from .blocks import TorchConv, TorchConvTranspose, ConvBlock, max_pool, avg_pool, resize_nearest, resize_linear, global_avg_pool

__all__ = [
    "kernel_initializer",
    "bias_initializer",
    "BatchNorm",
    "InstanceNorm",
    "TorchConv",
    "TorchConvTranspose",
    "ConvBlock",
    "max_pool",
    "avg_pool",
    "resize_nearest",
    "resize_linear",
    "global_avg_pool",
]
