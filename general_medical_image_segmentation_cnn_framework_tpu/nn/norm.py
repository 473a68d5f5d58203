"""Normalization layers with PyTorch-parity semantics, TPU-native sync.

``BatchNorm`` reproduces torch.nn.BatchNorm3d numerics (momentum 0.1 on the
*new* stat, unbiased running variance, biased variance for normalization,
eps 1e-5) and subsumes the reference's vendored thread-based sync-BN
(/root/reference/models/sync_batchnorm/batchnorm.py:48-125): under ``jit``
over a sharded global batch XLA computes global batch stats automatically;
under ``shard_map``/``pmap`` pass ``axis_name`` and the stats are ``pmean``-
reduced over ICI — one line where the reference needed three files of
master/slave queue plumbing.

``InstanceNorm`` matches torch.nn.InstanceNorm3d defaults (affine=False,
no running stats), as used by the residual U-Net
(/root/reference/models/three_d/residual_unet3d.py).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Trace-time default sync axis (see sync_bn_scope): lets the shard_map
# data-parallel forward turn every zoo BatchNorm into a sync-BN without
# threading an axis_name field through 23 model definitions.
_SYNC_BN_AXIS: list = []


@contextlib.contextmanager
def sync_bn_scope(axis_name: str):
    """Within this scope every ``BatchNorm`` without an explicit
    ``axis_name`` pmean-syncs its batch statistics over ``axis_name``.
    Used by the ``dp_backend=shard_map`` forward (train.py), where the
    model body runs per-device and batch-global BN semantics must be
    restored manually (GSPMD does it automatically; shard_map cannot)."""
    _SYNC_BN_AXIS.append(axis_name)
    try:
        yield
    finally:
        _SYNC_BN_AXIS.pop()


class BatchNorm(nn.Module):
    """Torch-parity batch norm over NDHWC (reduce all but the last axis).

    ``channel_axis`` supports channel positions other than -1 (the
    T-layout conv route keeps activations as [N, D, H, C, W]); the
    variable tree is position-independent (per-channel 1-D vectors)."""

    use_running_average: bool = False
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None  # set under shard_map/pmap for sync-BN
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        ch = self.channel_axis % x.ndim
        features = x.shape[ch]
        reduce_axes = tuple(ax for ax in range(x.ndim) if ax != ch)
        bshape = tuple(features if ax == ch else 1 for ax in range(x.ndim))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            axis_name = self.axis_name
            if axis_name is None and _SYNC_BN_AXIS:
                axis_name = _SYNC_BN_AXIS[-1]
            if axis_name is not None and not self.is_initializing():
                # (init runs outside the mapped context — no axis bound)
                mean = jax.lax.pmean(mean, axis_name)
                mean2 = jax.lax.pmean(mean2, axis_name)
                n *= jax.lax.psum(1, axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # torch stores the *unbiased* variance in running_var
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean.reshape(bshape)) * jax.lax.rsqrt(
            var.reshape(bshape) + self.epsilon
        )
        y = y * scale.reshape(bshape) + bias.reshape(bshape)
        return y.astype(self.dtype or x.dtype)


class InstanceNorm(nn.Module):
    """torch.nn.InstanceNorm3d defaults: per-sample/per-channel stats over
    spatial dims, eps 1e-5, affine=False, no running stats."""

    epsilon: float = 1e-5
    affine: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: [N, *spatial, C] -> reduce the spatial axes only
        reduce_axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes, keepdims=True)
        var = jnp.var(xf, axis=reduce_axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            features = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm parity (eps 1e-5, affine)."""

    num_groups: int = 8
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=self.dtype
        )(x)
