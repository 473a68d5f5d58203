"""HighResNet (Li et al. 2017) — dilated residual segmentation network.

Capability parity with the reference's ``HighResNet``/``HighRes3DNet``
(/root/reference/models/three_d/highresnet.py:13-143): first post-activation
conv block to 2^initial_out_channels_power channels, then ``dilations``
stages of ``DilationBlock`` (dilation 2^i, 3 residual blocks of 2 layers,
channels doubling per stage from the second stage on), optional NiftyNet
dropout head, and a 1x1 post-activation classifier without activation.

Note: the reference never wires this into its driver registry (SURVEY
§2.8 drift list) — here it is reachable as ``config.network=highresnet``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...nn.residual import ConvolutionalBlock, DilationBlock


class HighResNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 2
    dimensions: int = 3
    initial_out_channels_power: int = 4
    layers_per_residual_block: int = 2
    residual_blocks_per_dilation: int = 3
    dilations: int = 3
    batch_norm: bool = True
    instance_norm: bool = False
    residual: bool = True
    padding_mode: str = "constant"
    add_dropout_layer: bool = False
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert x.ndim - 2 == self.dimensions
        initial = 2 ** self.initial_out_channels_power
        kw = dict(
            batch_norm=self.batch_norm,
            instance_norm=self.instance_norm,
            padding_mode=self.padding_mode,
            init_type=self.init_type,
            dtype=self.dtype,
        )
        y = ConvolutionalBlock(
            out_channels=initial, dilation=1, preactivation=False, **kw
        )(x, train)

        out_channels = initial
        for dilation_idx in range(self.dilations):
            y = DilationBlock(
                out_channels=out_channels,
                dilation=2**dilation_idx,
                layers_per_block=self.layers_per_residual_block,
                num_residual_blocks=self.residual_blocks_per_dilation,
                residual=self.residual,
                **kw,
            )(y, train)
            out_channels *= 2
        out_channels //= 2

        if self.add_dropout_layer:
            y = ConvolutionalBlock(
                out_channels=80, dilation=1, preactivation=False, kernel_size=1,
                batch_norm=self.batch_norm, instance_norm=self.instance_norm,
                init_type=self.init_type, dtype=self.dtype,
            )(y, train)
            y = nn.Dropout(rate=0.5, deterministic=not train)(y)

        y = ConvolutionalBlock(
            out_channels=self.out_channels, dilation=1, preactivation=False,
            kernel_size=1, activation=False, **kw,
        )(y, train)
        return y.astype(jnp.float32)

    @property
    def receptive_field(self) -> int:
        """Closed form from the reference (highresnet.py:119-132)."""
        B = self.layers_per_residual_block
        D = self.dilations
        N = self.residual_blocks_per_dilation
        diff = (3 - 1) + sum(B * N * 2 ** (d + 1) for d in range(D))
        return diff + 1


class HighRes3DNet(HighResNet):
    dimensions: int = 3

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            out_channels=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
