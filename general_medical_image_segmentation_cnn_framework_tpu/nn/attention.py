"""Attention building blocks (SURVEY §7 target layout: nn/attention.py).

Re-exports the transformer primitives used by the zoo so they are
reusable outside their model files:

* ``WindowAttention3D`` — shifted-window 3-D attention with relative
  position bias and decoder V/K/Q cross-attention (VT-UNet).
* ``SwinTransformerBlock3D``, ``window_partition``, ``window_reverse``,
  ``get_window_size``, ``compute_mask`` — the Swin-3D toolkit.
* ``ViTSelfAttention`` — plain multi-head self-attention (UNETR encoder).
* ``DropPath`` — per-sample stochastic depth.
"""

from ..models.three_d.unetr import _SelfAttention as ViTSelfAttention
from ..models.three_d.vt_unet import (
    DropPath,
    Mlp,
    SwinTransformerBlock3D,
    WindowAttention3D,
    compute_mask,
    get_window_size,
    window_partition,
    window_reverse,
)

__all__ = [
    "ViTSelfAttention",
    "DropPath",
    "Mlp",
    "SwinTransformerBlock3D",
    "WindowAttention3D",
    "compute_mask",
    "get_window_size",
    "window_partition",
    "window_reverse",
]
