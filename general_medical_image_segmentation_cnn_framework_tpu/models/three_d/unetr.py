"""UNETR (Hatamizadeh et al. 2021): ViT encoder + conv decoder pyramid.

Capability parity with the reference's ``UNETR``
(/root/reference/models/three_d/unetr.py:194-294): Conv3d k16 s16 patch
embedding with learned position embeddings (:128-145), 12 pre-norm
transformer blocks (SelfAttention :54-99, PositionwiseFeedForward d_ff
2048 with ReLU+dropout0.1 :116-125), hidden states extracted at layers
3/6/9/12 (:205), and the conv/deconv decoder pyramid fusing z0..z12
(:277-294). The reference's dead ``Mlp`` class (:102-113, calls
``self.fc1()`` with no arg) is not replicated.

TPU-first: attention is one fused dot-product chain on the MXU
(jax.nn.dot_product_attention-equivalent einsum formulation), tokens stay
[B, N, C] channels-last throughout.

The reference driver instantiates bare ``UNETR()`` (train.py:348), which
only accepts 4-channel 128-cubed inputs; ``from_config`` instead wires
``config.patch_size/in_classes/out_classes`` so the model composes with
the rest of the framework (deviation documented per SURVEY §2.8).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...nn.blocks import TorchConv, TorchConvTranspose
from ...nn.norm import BatchNorm


class _ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 3
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = TorchConv(
            features=self.features, kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            init_type=self.init_type, dtype=self.dtype,
        )(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return nn.relu(y)


class _DeconvBlock(nn.Module):
    """Deconv3DBlock: transp k2s2 -> conv k3 -> BN -> ReLU (reference :40-51)."""

    features: int
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = TorchConvTranspose(
            features=self.features, kernel_size=2, stride=2,
            init_type=self.init_type, dtype=self.dtype,
        )(x)
        return _ConvBNReLU(self.features, 3, self.init_type, self.dtype)(y, train)


class _SelfAttention(nn.Module):
    num_heads: int
    embed_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        head_dim = self.embed_dim // self.num_heads
        dense = lambda: nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32)
        b, n, _ = x.shape
        q = dense()(x).reshape(b, n, self.num_heads, head_dim)
        k = dense()(x).reshape(b, n, self.num_heads, head_dim)
        v = dense()(x).reshape(b, n, self.num_heads, head_dim)
        # [B, H, N, N] attention on the MXU
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(head_dim)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = nn.Dropout(rate=self.dropout, deterministic=not train)(probs)
        ctx = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(b, n, self.embed_dim)
        out = dense()(ctx)
        return nn.Dropout(rate=self.dropout, deterministic=not train)(out)


class _TransformerBlock(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        y = _SelfAttention(self.num_heads, self.embed_dim, self.dropout, self.dtype)(y, train)
        x = y + h
        h = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        # PositionwiseFeedForward d_ff=2048, ReLU, dropout 0.1 (reference :116-125)
        y = nn.Dense(2048, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.Dropout(rate=0.1, deterministic=not train)(nn.relu(y))
        y = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32)(y)
        return y + h


class UNETR(nn.Module):
    img_shape: Tuple[int, int, int] = (128, 128, 128)
    input_dim: int = 4
    output_dim: int = 3
    embed_dim: int = 768
    patch_size: int = 16
    num_heads: int = 12
    dropout: float = 0.1
    num_layers: int = 12
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ext_layers = {3, 6, 9, 12}
        patch_dim = tuple(s // self.patch_size for s in self.img_shape)
        n_patches = int(np.prod(patch_dim))
        kw = dict(init_type=self.init_type, dtype=self.dtype)

        # patch embed: conv k16 s16 -> [B, n_patches, C] + learned pos emb
        tokens = TorchConv(
            features=self.embed_dim, kernel_size=self.patch_size,
            stride=self.patch_size, **kw,
        )(x)
        b = tokens.shape[0]
        tokens = tokens.reshape(b, n_patches, self.embed_dim)
        pos = self.param(
            "position_embeddings", nn.initializers.zeros,
            (1, n_patches, self.embed_dim), jnp.float32,
        )
        tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(rate=self.dropout, deterministic=not train)(tokens)

        extracted = []
        for depth in range(self.num_layers):
            tokens = _TransformerBlock(
                self.embed_dim, self.num_heads, self.dropout, self.dtype
            )(tokens, train)
            if depth + 1 in ext_layers:
                extracted.append(tokens)
        z3, z6, z9, z12 = [
            t.reshape(b, *patch_dim, self.embed_dim) for t in extracted
        ]

        conv_block = lambda f: _ConvBNReLU(f, 3, self.init_type, self.dtype)
        deconv = lambda f: TorchConvTranspose(features=f, kernel_size=2, stride=2, **kw)
        deconv_block = lambda f: _DeconvBlock(f, self.init_type, self.dtype)

        z12 = deconv(512)(z12)
        for f in (512,):
            z9 = deconv_block(f)(z9, train)
        y = jnp.concatenate([z9, z12], axis=-1)
        for f in (512, 512, 512):
            y = conv_block(f)(y, train)
        z9u = deconv(256)(y)

        z6d = z6
        for f in (512, 256):
            z6d = deconv_block(f)(z6d, train)
        y = jnp.concatenate([z6d, z9u], axis=-1)
        for f in (256, 256):
            y = conv_block(f)(y, train)
        z6u = deconv(128)(y)

        z3d = z3
        for f in (512, 256, 128):
            z3d = deconv_block(f)(z3d, train)
        y = jnp.concatenate([z3d, z6u], axis=-1)
        for f in (128, 128):
            y = conv_block(f)(y, train)
        z3u = deconv(64)(y)

        z0 = conv_block(32)(x, train)
        z0 = conv_block(64)(z0, train)
        y = jnp.concatenate([z0, z3u], axis=-1)
        y = conv_block(64)(y, train)
        y = conv_block(64)(y, train)
        out = TorchConv(features=self.output_dim, kernel_size=1, **kw)(y)
        return out.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            img_shape=tuple(config.patch_size),
            input_dim=config.in_classes,
            output_dim=config.out_classes,
            init_type=getattr(config, "init_type", "none"),
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
