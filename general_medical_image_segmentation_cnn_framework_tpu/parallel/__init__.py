"""Parallelism layer: device mesh + sharding helpers."""

from .mesh import init_distributed, make_data_mesh, make_mesh, parse_mesh_shape, shard_batch, replicate

__all__ = [
    "init_distributed",
    "make_data_mesh",
    "make_mesh",
    "parse_mesh_shape",
    "shard_batch",
    "replicate",
]
