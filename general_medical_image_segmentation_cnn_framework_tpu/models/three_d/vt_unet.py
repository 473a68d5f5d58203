"""VT-UNet: 3-D Swin-Transformer U-Net (Peiris et al. 2022).

Capability parity with the reference's ``SwinTransformerSys3D``
(/root/reference/models/three_d/vt_unet.py:771-1002) and its building
blocks: patch embed k4s4 (+LayerNorm, :726-768), shifted 3-D window
attention with relative-position bias (:124-229), cyclic-shift attention
masks (:617-630), PatchMerging over H/W only (:408-436), decoder
``BasicLayer_up`` with cross-attention against cached encoder V/K/Q
(:532-613; the decoder branch of WindowAttention3D :210-228), sinusoidal
``PositionalEncoding3D`` blended at alpha=0.5 (:232-277, :378-403),
``FinalPatchExpand_X4`` + 1x1 conv head (:502-529, :978-988).

Faithfully reproduced quirks:
* the depth axis D is NEVER downsampled (PatchMerging/PatchExpand act on
  H/W only) — the reference hardcodes D=32 for the 128^3 geometry
  (vt_unet.py:66,493); we compute D from the tensor so any input size
  works, identical for 128^3;
* the decoder's cross-attention query is scaled TWICE (q*scale before
  self-attention and again at :214) — reproduced;
* ``forward_part3`` reuses the block's own norm2+MLP on the positional
  encoding (:369-376,403) — reproduced.

Not replicated: the mmcv-dependent 2D->3D ``inflate_weights`` checkpoint
surgery (:1004-1060) — torch-checkpoint loading is out of scope for a
TPU-native rebuild.

TPU-first: tokens stay channels-last [B, D, H, W, C]; window partition is
pure reshape/transpose; each (window-count, N, N) attention is one batched
MXU matmul chain.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

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
def compute_mask(dp, hp, wp, window_size, shift_size):
    """Attention mask for cyclic shift (reference :617-630). numpy, cached."""
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
    attn_mask = m[:, None, :] - m[:, :, None]
    # NOTE: return numpy, not jnp — the lru_cache must never hold a traced
    # device array (it would leak tracers across jit traces)
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)  # [nW, N, N]


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


class _MatmulConv(nn.Module):
    """Conv with stride == kernel_size as ONE space-to-depth matmul
    (ops/conv3d.conv_patch_matmul). Param names/init match flax nn.Conv, so
    the variable tree (and the Swin inflation mapping) is unchanged."""

    features: int
    kernel_size: Tuple[int, int, int]
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops.conv3d import conv_patch_matmul

        k = tuple(self.kernel_size)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            k + (x.shape[-1], self.features),
            jnp.float32,
        )
        y = conv_patch_matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


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

        emb = np.zeros((x, y, z, self.channels * 3), np.float32)
        emb[:, :, :, : self.channels] = axis_emb(x)[:, None, None, :]
        emb[:, :, :, self.channels : 2 * self.channels] = axis_emb(y)[None, :, None, :]
        emb[:, :, :, 2 * self.channels :] = axis_emb(z)[None, None, :, :]
        out = np.broadcast_to(emb[None, :, :, :, :orig_ch], (b, x, y, z, orig_ch))
        return jnp.asarray(out)


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
        attn = WindowAttention3D(
            self.dim, window_size, self.num_heads, self.qkv_bias,
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


class PatchMerging(nn.Module):
    """Merge 2x2 over H/W only; linear 4C->2C (reference :408-436)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2, :]
        x1 = x[:, :, 1::2, 0::2, :]
        x2 = x[:, :, 0::2, 1::2, :]
        x3 = x[:, :, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class PatchExpand(nn.Module):
    """Expand H/W x2, channels /2 (reference PatchExpand/:468-499 and
    PatchExpand_Up/:439-465 — identical math; D passes through)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        c2 = 2 * self.dim
        x = x.reshape(b, d, h, w, 2, 2, c2 // 4)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, d, h * 2, w * 2, c2 // 4)
        return nn.LayerNorm(dtype=self.dtype)(x)


class FinalPatchExpandX4(nn.Module):
    """Expand all three dims x4 (reference :502-529)."""

    dim: int
    dim_scale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        p = self.dim_scale
        x = nn.Dense(4 * 16 * self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        cc = x.shape[-1] // (p**3)
        x = x.reshape(b, d, h, w, p, p, p, cc)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        x = x.reshape(b, d * p, h * p, w * p, cc)
        return nn.LayerNorm(dtype=self.dtype)(x)


class BasicLayer(nn.Module):
    """Encoder stage (reference :634-723): blocks alternate no-shift/shift;
    caches each parity's (v, k, q) for the decoder's cross attention."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (7, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, d, h, w, c = x.shape
        shift = tuple(i // 2 for i in self.window_size)
        window_size, shift_size = get_window_size((d, h, w), self.window_size, shift)
        dp = int(np.ceil(d / window_size[0])) * window_size[0]
        hp = int(np.ceil(h / window_size[1])) * window_size[1]
        wp = int(np.ceil(w / window_size[2])) * window_size[2]
        attn_mask = jnp.asarray(compute_mask(dp, hp, wp, window_size, shift_size))

        cached = {0: (None,) * 3, 1: (None,) * 3}
        for i in range(self.depth):
            blk = SwinTransformerBlock3D(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path[i],
                dtype=self.dtype,
            )
            x, v, k, q = blk(x, attn_mask, None, train)
            cached[i % 2] = (v, k, q)

        skip = x
        if self.has_downsample:
            x = PatchMerging(self.dim, self.dtype)(x)
        return x, skip, cached[0], cached[1]


class BasicLayerUp(nn.Module):
    """Decoder stage with cross-attention to cached encoder V/K/Q
    (reference :532-613)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (7, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    has_upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prev1, prev2, train: bool = True):
        b, d, h, w, c = x.shape
        shift = tuple(i // 2 for i in self.window_size)
        window_size, shift_size = get_window_size((d, h, w), self.window_size, shift)
        dp = int(np.ceil(d / window_size[0])) * window_size[0]
        hp = int(np.ceil(h / window_size[1])) * window_size[1]
        wp = int(np.ceil(w / window_size[2])) * window_size[2]
        attn_mask = jnp.asarray(compute_mask(dp, hp, wp, window_size, shift_size))

        for i in range(self.depth):
            blk = SwinTransformerBlock3D(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path[i] if i < len(self.drop_path) else self.drop_path[-1],
                dtype=self.dtype,
            )
            prev = prev1 if i % 2 == 0 else prev2
            x, _, _, _ = blk(x, attn_mask, prev, train)

        if self.has_upsample:
            x = PatchExpand(self.dim // 2, self.dtype)(x)
        return x


class SwinTransformerSys3D(nn.Module):
    img_size: Tuple[int, int, int] = (128, 128, 128)
    patch_size: Tuple[int, int, int] = (4, 4, 4)
    in_chans: int = 4
    num_classes: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 1)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (7, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_layers = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        # patch embed: conv k4 s4 (+ LayerNorm) — stride==kernel runs as a
        # space-to-depth matmul (ops/conv3d.conv_patch_matmul); param names
        # and init match nn.Conv so the variable tree is unchanged.
        # Reference PatchEmbed3D zero-pads non-divisible inputs up to a
        # patch_size multiple before the embed (vt_unet.py:752-759); output
        # then lives at the padded resolution, as upstream.
        pads = [
            (0, (-x.shape[1 + i]) % self.patch_size[i]) for i in range(3)
        ]
        if any(p[1] for p in pads):
            x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        y = _MatmulConv(
            features=self.embed_dim,
            kernel_size=self.patch_size,
            dtype=self.dtype,
            name="Conv_0",
        )(x)
        if self.patch_norm:
            y = nn.LayerNorm(dtype=self.dtype)(y)
        y = nn.Dropout(rate=self.drop_rate, deterministic=not train)(y)

        # encoder
        skips, caches1, caches2 = [], [], []
        for i in range(num_layers):
            layer = BasicLayer(
                dim=int(self.embed_dim * 2**i),
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])],
                has_downsample=i < num_layers - 1,
                dtype=self.dtype,
            )
            skips.append(y)  # pre-layer input, as in reference forward_features
            y, _, c1, c2 = layer(y, train)
            caches1.append(c1)
            caches2.append(c2)

        y = nn.LayerNorm(dtype=self.dtype)(y)

        # decoder
        for inx in range(num_layers):
            if inx == 0:
                y = PatchExpand(
                    int(self.embed_dim * 2 ** (num_layers - 1 - inx)), self.dtype
                )(y)
            else:
                skip = skips[num_layers - 1 - inx]
                y = jnp.concatenate([y, skip], axis=-1)
                y = nn.Dense(
                    int(self.embed_dim * 2 ** (num_layers - 1 - inx)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                )(y)
                y = BasicLayerUp(
                    dim=int(self.embed_dim * 2 ** (num_layers - 1 - inx)),
                    depth=self.depths[num_layers - 1 - inx],
                    num_heads=self.num_heads[num_layers - 1 - inx],
                    window_size=self.window_size,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=dpr[
                        sum(self.depths[: num_layers - 1 - inx]) : sum(
                            self.depths[: num_layers - inx]
                        )
                    ],
                    has_upsample=inx < num_layers - 1,
                    dtype=self.dtype,
                )(y, caches1[num_layers - 1 - inx], caches2[num_layers - 1 - inx], train)

        y = nn.LayerNorm(dtype=self.dtype)(y)

        # up x4 + head (1x1x1 projection -> plain matmul)
        y = FinalPatchExpandX4(self.embed_dim, 4, self.dtype)(y)
        y = _MatmulConv(
            features=self.num_classes, kernel_size=(1, 1, 1),
            use_bias=False, dtype=self.dtype, name="Conv_1",
        )(y)
        return y.astype(jnp.float32)
