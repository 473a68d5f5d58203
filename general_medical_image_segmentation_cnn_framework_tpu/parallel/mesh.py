"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's entire distributed stack: HF
Accelerate DDP (/root/reference/train.py:167-169) and the vendored
thread-based sync-BN (/root/reference/models/sync_batchnorm/). One
``Mesh`` + ``NamedSharding`` over ICI subsumes both — gradients and BN
statistics become XLA collectives inserted by the compiler.

``config.mesh_shape`` grammar: ``"data=-1"`` (all devices on one data axis),
``"data=4,model=2"`` (2-D mesh), etc. ``-1`` means "remaining devices".
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(config=None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` when running
    under a multi-process launcher (SURVEY §2.6's named TPU-native
    equivalent of the reference's NCCL process group).

    No-op for single-process runs. Coordinator/process env comes from the
    standard JAX vars (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``) or TPU pod metadata; config keys of the same names
    (lowercased) override.
    """
    import os

    coord = None
    num = None
    pid = None
    if config is not None:
        coord = getattr(config, "coordinator_address", None)
        num = getattr(config, "num_processes", None)
        pid = getattr(config, "process_id", None)
    coord = coord or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = num if num is not None else os.environ.get("JAX_NUM_PROCESSES")
    if coord is None and num is None:
        return  # single-process
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if num is not None:
        kwargs["num_processes"] = int(num)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def parse_mesh_shape(spec: str, n_devices: Optional[int] = None) -> Dict[str, int]:
    """Parse "data=-1" / "data=4,model=2" into an ordered axis dict."""
    n_devices = n_devices if n_devices is not None else len(jax.devices())
    axes: Dict[str, int] = {}
    wildcard: Optional[str] = None
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        name, _, size = part.partition("=")
        size_i = int(size)
        if size_i == -1:
            assert wildcard is None, "only one -1 axis allowed"
            wildcard = name.strip()
            axes[wildcard] = -1
        else:
            axes[name.strip()] = size_i
    fixed = int(np.prod([s for s in axes.values() if s != -1])) or 1
    if wildcard is not None:
        assert n_devices % fixed == 0, f"{n_devices} devices not divisible by {fixed}"
        axes[wildcard] = n_devices // fixed
    total = int(np.prod(list(axes.values())))
    assert total == n_devices, (
        f"mesh {axes} covers {total} devices but {n_devices} are available"
    )
    return axes


def make_mesh(
    mesh_shape: str = "data=-1", devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    axes = parse_mesh_shape(mesh_shape, len(devices))
    dev_array = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def make_data_mesh(mesh_shape: str, batch_size: int) -> Mesh:
    """Mesh whose 'data' axis divides the global batch.

    A batch that doesn't divide across every device (e.g. bs=2 on 8 chips)
    is sharded over the largest divisor instead — the remaining devices
    idle rather than erroring (DDP would do the same with fewer ranks).

    An explicit spec smaller than the machine (e.g. ``data=1`` on 8
    devices) runs on a device prefix — useful to pin a single-device run
    or A/B a sharding against fewer chips.
    """
    devices = jax.devices()
    if "-1" not in str(mesh_shape):
        sizes = [
            int(p.partition("=")[2])
            for p in str(mesh_shape).split(",") if p.strip()
        ]
        total = int(np.prod(sizes)) if sizes else len(devices)
        if 0 < total < len(devices):
            devices = devices[:total]
    axes = parse_mesh_shape(mesh_shape, len(devices))
    if list(axes.keys()) == ["data"] and batch_size % axes["data"] != 0:
        import math

        d = math.gcd(batch_size, len(devices))
        return make_mesh(f"data={d}", devices=devices[:d])
    return make_mesh(mesh_shape, devices=devices)


def shard_batch(mesh: Mesh, batch, axis: str = "data", dim: int = 0):
    """Place a host batch on the mesh, sharded along dim (default: batch).

    dim=0 is the proper TPU analogue of Accelerate's DDP scatter: the
    global batch lives sharded across devices; XLA handles every
    collective after this point. dim=1 shards the first SPATIAL axis
    instead — volumes larger than one chip's HBM train whole, with GSPMD
    inserting the conv halo exchanges over ICI (config.spatial_sharding).
    """
    def put(x):
        spec = [None] * x.ndim
        spec[dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
