"""FSDP-style parameter sharding over the data axis (ZeRO-3 analogue).

Beyond replicated data-parallelism, parameters and optimizer state can be
SHARDED across the mesh's data axis: each chip holds 1/N of every large
tensor, XLA inserts all-gathers where a full parameter is consumed and
reduce-scatters for its gradient — the standard memory-scaling recipe,
expressed purely through ``NamedSharding`` (no wrapper module, no manual
collectives; sharding propagation does the rest).

Usage:
    shardings = fsdp_shardings(params, mesh, axis="data")
    params = jax.device_put(params, shardings)
    opt_state = jax.device_put(opt_state, fsdp_shardings(opt_state, mesh))
    # jit'ted train step runs unchanged; donate as usual.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(shape, axis_size: int, min_size: int) -> P:
    """Shard the largest axis divisible by the mesh axis; replicate if none
    (or the tensor is too small for sharding to pay)."""
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % axis_size == 0 and shape[i] >= axis_size:
            spec = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data", min_size: int = 2**14):
    """A pytree of NamedShardings mirroring `tree`: large tensors sharded
    along their largest divisible dim over `axis`, the rest replicated."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def one(x):
        shape = getattr(x, "shape", ())
        spec = _spec_for(tuple(shape), axis_size, min_size)
        if axis != "data" and spec != P():
            spec = P(*[axis if s == "data" else s for s in spec])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(one, tree)


def shard_params_fsdp(tree, mesh: Mesh, axis: str = "data", min_size: int = 2**14):
    """device_put `tree` with fsdp_shardings."""
    return jax.device_put(tree, fsdp_shardings(tree, mesh, axis, min_size))