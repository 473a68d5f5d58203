"""Spatial (volume) sharding with halo exchange — full-volume training.

The reference's only answer to "volume too big for memory" is host-side
patch decomposition (SURVEY §5). The principled TPU extension is to shard
the volume's depth axis across the mesh and run convolutions with halo
exchange over ICI: each shard sends its boundary slabs to its neighbors
with ``lax.ppermute`` so a k-wide conv sees the voxels it needs, and the
result is identical to the unsharded convolution (tested).

Usage (inside ``shard_map`` over a mesh axis, e.g. 'spatial'):

    y_local = halo_conv3d(x_local, kernel, axis_name='spatial')

or at the host level for a whole sharded array:

    y = spatial_conv3d(x, kernel, mesh, axis='spatial')
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.conv3d import conv3d_decomposed


def halo_exchange(local: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Concatenate `halo` boundary slabs from both depth-neighbors.

    local: [N, d_local, H, W, C], sharded on depth across `axis_name`.
    Boundary shards receive zero padding (matching a torch-style
    symmetrically padded convolution on the global volume).
    """
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    # slab my shard sends forward arrives as my successor's LEFT halo
    from_prev = jax.lax.ppermute(local[:, -halo:], axis_name, fwd)
    from_next = jax.lax.ppermute(local[:, :halo], axis_name, bwd)

    zero = jnp.zeros_like(from_prev)
    left = jnp.where(idx == 0, zero, from_prev)
    right = jnp.where(idx == n_shards - 1, zero, from_next)
    return jnp.concatenate([left, local, right], axis=1)


def halo_conv3d(
    local: jnp.ndarray,
    kernel: jnp.ndarray,
    axis_name: str,
    stride: Sequence[int] = (1, 1, 1),
) -> jnp.ndarray:
    """k*k*k conv on a depth-sharded volume; 'same'-padded globally.

    Requires d_local divisible by stride[0]. The depth padding that a
    single-device conv would apply is realized as halos (interior shards)
    or zeros (boundary shards).
    """
    k = kernel.shape[0]
    halo = k // 2
    padded = halo_exchange(local, halo, axis_name)
    # depth already padded via halos -> pd=0; H/W keep torch-style padding
    return conv3d_decomposed(padded, kernel, stride, (0, halo, halo))


def spatial_conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    mesh: Mesh,
    axis: str = "spatial",
) -> jnp.ndarray:
    """Whole-array convenience wrapper: shard depth, conv with halos."""
    from jax import shard_map

    spec = P(None, axis)

    fn = shard_map(
        partial(halo_conv3d, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
        check_vma=False,
    )
    x = jax.device_put(x, NamedSharding(mesh, spec))
    return fn(x, kernel)
