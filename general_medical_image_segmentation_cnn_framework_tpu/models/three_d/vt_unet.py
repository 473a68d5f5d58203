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

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...nn.attention import (
    DropPath,
    Mlp,
    PositionalEncoding3D,
    SwinTransformerBlock3D,
    WindowAttention3D,
    _relative_position_index,
    _trunc_normal,
    compute_mask,
    get_window_size,
    window_partition,
    window_reverse,
)


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
            # reference PatchExpand_Up(dim) = Linear(dim, 2*dim) -> channels
            # dim/2 after the 2x2 shuffle (reference vt_unet.py:583,445-470);
            # passing dim//2 here would halve the decoder width
            x = PatchExpand(self.dim, self.dtype)(x)
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
