"""Misc utilities: device transfer helpers, offline data tools."""

from .transfer import chunked_device_get

__all__ = ["chunked_device_get"]
