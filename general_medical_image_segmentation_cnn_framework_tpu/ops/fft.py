"""FFT band-split for the IS model's extra inputs.

Reproduces the *intent* of ``low_pass_torch``/``high_pass_torch``
(/root/reference/train.py:76-88, duplicated predict.py:48-60): rFFT the
volume, keep frequencies below/above ``limit`` (0.04) along the last two
spatial axes, inverse-transform.

Deliberate deviation (documented per SURVEY §2.8): the reference calls
``torch.fft.rfftn`` over ALL tensor dims (including batch) but inverts only
the last three, which mixes batch elements when bs > 1 — a bug. We
transform only the spatial dims, which is the obviously-intended behavior
and is identical for bs == 1.

Layout: channels-last [B, D, H, W, C]; spatial axes are (1, 2, 3); the
masked axes are the last two spatial axes (H, W), matching the reference's
masks over its dims (-2, -1).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _freq_masks(h: int, w: int, limit: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    pass1 = jnp.abs(jnp.fft.rfftfreq(w)) < limit  # last axis (rfft)
    pass2 = jnp.abs(jnp.fft.fftfreq(h)) < limit  # second-to-last (full fft)
    low = jnp.outer(pass2, pass1)
    block1 = jnp.abs(jnp.fft.rfftfreq(w)) > limit
    block2 = jnp.abs(jnp.fft.fftfreq(h)) > limit
    high = jnp.outer(block2, block1)
    return low, high


def band_split(x: jnp.ndarray, limit: float = 0.04) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One FFT, two inverse transforms -> (low, high). x: [B, D, H, W, C]."""
    h, w = x.shape[2], x.shape[3]
    low_k, high_k = _freq_masks(h, w, limit)
    shape = x.shape[1:4]
    xf = jnp.fft.rfftn(x.astype(jnp.float32), axes=(1, 2, 3))
    kernel_shape = (1, 1, h, w // 2 + 1, 1)
    low = jnp.fft.irfftn(xf * low_k.reshape(kernel_shape), s=shape, axes=(1, 2, 3))
    high = jnp.fft.irfftn(xf * high_k.reshape(kernel_shape), s=shape, axes=(1, 2, 3))
    return low.astype(x.dtype), high.astype(x.dtype)


def low_pass(x: jnp.ndarray, limit: float = 0.04) -> jnp.ndarray:
    return band_split(x, limit)[0]


def high_pass(x: jnp.ndarray, limit: float = 0.04) -> jnp.ndarray:
    return band_split(x, limit)[1]
