"""Device->host transfer helpers.

Some TPU transports (notably tunneled/relayed PJRT clients) collapse to
~0.1 MB/s on single transfers above ~8-16 MB, and each round trip carries
seconds of latency — but one ``device_get`` of MANY small arrays fetches
them in parallel at full speed. ``chunked_device_get`` therefore splits
every large leaf into <=4 MB pieces ON DEVICE (one jitted split per leaf
shape) and issues a single batched ``device_get`` for the whole tree.
Measured >100x faster on such links; within noise of a plain device_get on
directly-attached devices.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK_BYTES = 4 * 1024 * 1024


@lru_cache(maxsize=None)
def _splitter(n: int, per: int, dtype_name: str):
    """Jitted flat-array splitter: one compile per (n, per, dtype)."""
    bounds = list(range(per, n, per))

    @jax.jit
    def split(flat):
        return tuple(jnp.split(flat, bounds))

    return split


def chunked_device_get(tree, chunk_bytes: int = _CHUNK_BYTES):
    """device_get a pytree; large leaves are split on device and the whole
    tree is fetched with ONE batched device_get (parallel transfers)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    pieces = []  # flat list of device arrays to fetch
    plans = []  # per leaf: (num_pieces, shape) or (1, None) for small leaf
    for x in leaves:
        nbytes = getattr(x, "nbytes", 0)
        if nbytes <= chunk_bytes or not hasattr(x, "shape"):
            pieces.append(x)
            plans.append((1, None))
            continue
        n = int(np.prod(x.shape))
        per = max(1, chunk_bytes // max(x.dtype.itemsize, 1))
        parts = _splitter(n, per, str(x.dtype))(jnp.ravel(x))
        pieces.extend(parts)
        plans.append((len(parts), x.shape))

    fetched = jax.device_get(pieces)

    out = []
    idx = 0
    for count, shape in plans:
        if shape is None:
            out.append(np.asarray(fetched[idx]))
            idx += 1
        else:
            out.append(np.concatenate(fetched[idx : idx + count]).reshape(shape))
            idx += count
    return jax.tree_util.tree_unflatten(treedef, out)
