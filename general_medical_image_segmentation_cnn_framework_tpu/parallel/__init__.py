"""Parallelism layer: device mesh + sharding helpers."""

from .mesh import make_mesh, parse_mesh_shape, shard_batch, replicate

__all__ = ["make_mesh", "parse_mesh_shape", "shard_batch", "replicate"]
