"""Attention building blocks (SURVEY §7 target layout: nn/attention.py).

The Swin-3D toolkit lives HERE (moved from models/three_d/vt_unet.py in
r3 — this module had been a pure re-export); model files import from it:

* ``WindowAttention3D`` — shifted-window 3-D attention with relative
  position bias and decoder V/K/Q cross-attention (VT-UNet,
  reference vt_unet.py:124-229).
* ``SwinTransformerBlock3D`` + ``window_partition`` / ``window_reverse``
  / ``get_window_size`` / ``compute_mask`` — the Swin-3D block machinery
  (reference :279-403, :617-630).
* ``PositionalEncoding3D`` — sinusoidal FPE blended at alpha=0.5.
* ``ViTSelfAttention`` — plain multi-head self-attention (UNETR encoder;
  implementation stays in models/three_d/unetr.py whose class name fixes
  the checkpoint scope).
* ``DropPath`` — per-sample stochastic depth.

Flax scope names derive from class names, so moving the definitions here
leaves every checkpoint/param tree unchanged.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _trunc_normal(std):
    return nn.initializers.truncated_normal(stddev=std)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.Dropout(rate=self.drop, deterministic=not train)(x)


def window_partition(x, window_size):
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C] (reference :77-90)."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window_size
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse(windows, window_size, b, d, h, w):
    wd, wh, ww = window_size
    x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window to the input extent per axis; zero that axis's shift."""
    use_ws = list(window_size)
    use_ss = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_ws[i] = x_size[i]
            if use_ss is not None:
                use_ss[i] = 0
    if use_ss is None:
        return tuple(use_ws)
    return tuple(use_ws), tuple(use_ss)


@lru_cache()
def window_region_ids(dp, hp, wp, window_size, shift_size) -> np.ndarray:
    """Window-partitioned cyclic-shift region ids [nW, N] (reference
    :617-630 up to the pairwise step). numpy, cached — tiny (nW * N ints)."""
    img_mask = np.zeros((1, dp, hp, wp, 1), np.float32)
    cnt = 0
    for d in (
        slice(-window_size[0]),
        slice(-window_size[0], -shift_size[0]) if shift_size[0] else slice(0, 0),
        slice(-shift_size[0], None) if shift_size[0] else slice(0, 0),
    ):
        for h in (
            slice(-window_size[1]),
            slice(-window_size[1], -shift_size[1]) if shift_size[1] else slice(0, 0),
            slice(-shift_size[1], None) if shift_size[1] else slice(0, 0),
        ):
            for w in (
                slice(-window_size[2]),
                slice(-window_size[2], -shift_size[2]) if shift_size[2] else slice(0, 0),
                slice(-shift_size[2], None) if shift_size[2] else slice(0, 0),
            ):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    b, d, h, w, c = img_mask.shape
    wd, wh, ww = window_size
    m = img_mask.reshape(1, d // wd, wd, h // wh, wh, w // ww, ww, 1)
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww)
    # NOTE: return numpy, not jnp — the lru_cache must never hold a traced
    # device array (it would leak tracers across jit traces)
    return m  # [nW, N]


def compute_mask(dp, hp, wp, window_size, shift_size):
    """Attention mask for cyclic shift (reference :617-630): [nW, N, N],
    -100 where two window positions belong to different shift regions.

    The pairwise tensor is built ON DEVICE from the tiny cached id grid:
    embedding it as a literal would bake O(nW * N^2) floats into the HLO
    (60 MB at the 128^3 training grid, 235 MB for a 256x256x128 whole
    volume — past the remote-compile request limit on tunneled setups).
    """
    m = jnp.asarray(window_region_ids(dp, hp, wp, window_size, shift_size))
    diff = m[:, None, :] - m[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


def _relative_position_index(window_size) -> np.ndarray:
    wd, wh, ww = window_size
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)  # [N, N]


class WindowAttention3D(nn.Module):
    """W-MSA with relative position bias + optional decoder cross-attention
    against cached encoder V/K/Q (reference :124-229)."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, prev=None, train: bool = True):
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        ws = self.window_size
        table_size = (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1)
        bias_table = self.param(
            "relative_position_bias_table",
            _trunc_normal(0.02),
            (table_size, self.num_heads),
            jnp.float32,
        )
        rel_index = _relative_position_index(ws)

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, nH, N, hd]
        q = q * scale

        rel_bias = bias_table[rel_index[:n, :n].reshape(-1)].reshape(
            n, n, self.num_heads
        )
        rel_bias = rel_bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # [1,nH,N,N]

        proj = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)
        attn_dropout = nn.Dropout(rate=self.attn_drop, deterministic=not train)
        proj_dropout = nn.Dropout(rate=self.proj_drop, deterministic=not train)

        def attend(query, key, value):
            attn = jnp.einsum("bhnd,bhmd->bhnm", query, key).astype(jnp.float32)
            attn = attn + rel_bias
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
                attn = attn + mask[None, :, None, :, :]
                attn = attn.reshape(-1, self.num_heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            attn = attn_dropout(attn)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, value)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
            return proj_dropout(proj(out))

        out = attend(q, k, v)
        out2 = None
        if prev is not None:
            prev_v, prev_k, prev_q = prev
            # reference double-scales the decoder query (:214) — reproduced
            out2 = attend(q * scale, prev_k, prev_v)
        return out, out2, v, k, q



class PositionalEncoding3D:
    """Sinusoidal 3-D positional encoding (reference :232-277). Pure fn."""

    def __init__(self, channels: int):
        ch = int(np.ceil(channels / 6) * 2)
        if ch % 2:
            ch += 1
        self.channels = ch
        self.inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float32) / ch))

    def __call__(self, shape, orig_ch) -> jnp.ndarray:
        b, x, y, z = shape

        def axis_emb(length):
            pos = np.arange(length, dtype=np.float32)
            sin_inp = np.einsum("i,j->ij", pos, self.inv_freq)
            return np.concatenate([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)

        # only the three tiny per-axis tables are host constants; the full
        # [x, y, z, 3c] grid is broadcast+concatenated ON DEVICE (a literal
        # would bake O(x*y*z*c) floats into the HLO per stage — 50+ MB at
        # whole-volume sizes, a main contributor to remote-compile bloat)
        c = self.channels
        ex = jnp.broadcast_to(jnp.asarray(axis_emb(x))[:, None, None, :], (x, y, z, c))
        ey = jnp.broadcast_to(jnp.asarray(axis_emb(y))[None, :, None, :], (x, y, z, c))
        ez = jnp.broadcast_to(jnp.asarray(axis_emb(z))[None, None, :, :], (x, y, z, c))
        emb = jnp.concatenate([ex, ey, ez], axis=-1)[..., :orig_ch]
        return jnp.broadcast_to(emb[None], (b, x, y, z, orig_ch))


class SwinTransformerBlock3D(nn.Module):
    """One (shifted-)window transformer block (reference :279-403)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (7, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_matrix, prev=None, train: bool = True):
        b, d, h, w, c = x.shape
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size, self.shift_size
        )
        shortcut = x

        norm1 = nn.LayerNorm(dtype=self.dtype)
        norm2 = nn.LayerNorm(dtype=self.dtype)
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop, self.dtype)
        # The reference constructs the attention module with the CONFIGURED
        # window (reference vt_unet.py:303-305), so the bias table stays
        # (2w-1)^3 even when the runtime window is clamped by a small grid;
        # the forward then slices relative_position_index[:N, :N]
        # (reference :190). Passing the clamped size here would both change
        # the param tree shape and the (quirky) bias-slice semantics.
        attn = WindowAttention3D(
            self.dim, self.window_size, self.num_heads, self.qkv_bias,
            self.attn_drop, self.drop, self.dtype,
        )
        drop_path = DropPath(self.drop_path)

        y = norm1(x)
        pad_d = (window_size[0] - d % window_size[0]) % window_size[0]
        pad_b = (window_size[1] - h % window_size[1]) % window_size[1]
        pad_r = (window_size[2] - w % window_size[2]) % window_size[2]
        y = jnp.pad(y, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0)))
        _, dp, hp, wp, _ = y.shape
        if any(s > 0 for s in shift_size):
            y = jnp.roll(y, (-shift_size[0], -shift_size[1], -shift_size[2]), (1, 2, 3))
            attn_mask = mask_matrix
        else:
            attn_mask = None

        windows = window_partition(y, window_size)
        aw, caw, v, k, q = attn(windows, attn_mask, prev, train)

        def merge(wins):
            z = window_reverse(wins, window_size, b, dp, hp, wp)
            if any(s > 0 for s in shift_size):
                z = jnp.roll(z, shift_size, (1, 2, 3))
            return z[:, :d, :h, :w, :]

        y = merge(aw)
        x = shortcut + drop_path(y, train)
        x = x + drop_path(mlp(norm2(x), train), train)

        if caw is not None:
            alpha = 0.5
            y2 = shortcut + drop_path(merge(caw), train)
            y2 = y2 + drop_path(mlp(norm2(y2), train), train)
            fpe = PositionalEncoding3D(c)((b, d, h, w), c).astype(x.dtype)
            # forward_part3 reuses the block's norm2+mlp (reference :369,:403)
            x = (1 - alpha) * x + alpha * y2 + mlp(norm2(fpe), train)

        return x, v, k, q




from ..models.three_d.unetr import _SelfAttention as ViTSelfAttention  # noqa: E402

__all__ = [
    "ViTSelfAttention",
    "DropPath",
    "Mlp",
    "PositionalEncoding3D",
    "SwinTransformerBlock3D",
    "WindowAttention3D",
    "compute_mask",
    "window_region_ids",
    "get_window_size",
    "window_partition",
    "window_reverse",
]
