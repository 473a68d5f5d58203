"""GPipe-style pipeline parallelism over stacks of identical blocks.

The TPU-native pipeline recipe (scaling-book shape): put L identical
blocks' parameters in ONE stacked pytree (leading dim L), shard that dim
over a 'stage' mesh axis (S stages × L/S blocks each), and stream M
microbatches through the stages inside a single ``shard_map`` program —
activations hop stage→stage over ICI via ``lax.ppermute`` while every
stage computes on its current microbatch.  Fill/drain bubble is the
standard (S-1)/(M+S-1); differentiable end-to-end (the transpose of the
rotation is the reverse rotation, handled by autodiff).

This completes the parallelism matrix (data / spatial / tensor / FSDP /
pipeline), all expressible on one ``jax.sharding.Mesh``.  The reference
framework has none of these (single-process CUDA,
/root/reference/train.py).

Integration: UNETR's 12 identical ``_TransformerBlock``s are the natural
target — ``unetr_pp_forward`` mirrors ``UNETR.__call__`` functionally
(same submodule order and param names, equivalence-tested) with the
encoder loop replaced by :func:`gpipe`; the extraction layers {3,6,9,12}
align with stage boundaries for S ∈ {2,3,4,6,12} whenever each
extraction index is a multiple of L/S.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def stack_blocks(params: dict, prefix: str, n: int):
    """Stack ``params[f'{prefix}{i}']`` for i in [0, n) into one pytree
    with leading dim n (identical shapes required)."""
    subtrees = [params[f"{prefix}{i}"] for i in range(n)]
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *subtrees)


def unstack_blocks(stacked, prefix: str) -> dict:
    """Inverse of :func:`stack_blocks` (checkpoint interop)."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return {
        f"{prefix}{i}": jax.tree.map(lambda a, i=i: a[i], stacked)
        for i in range(n)
    }


def gpipe(
    block_apply: Callable,
    stacked_params,
    x: jax.Array,
    mesh,
    axis: str = "stage",
    n_micro: Optional[int] = None,
    rng: Optional[jax.Array] = None,
):
    """Run ``x`` through L stacked blocks pipelined over ``mesh[axis]``.

    block_apply: ``(one_block_params, x_mb) -> x_mb`` shape/dtype-
        preserving, or ``(one_block_params, x_mb, rng) -> x_mb`` when
        ``rng`` is given (rng is folded per (global block index,
        microbatch) so dropout streams are independent).
    stacked_params: pytree with leading dim L on every leaf.
    x: ``[B, ...]`` global batch; B must divide into ``n_micro``
        microbatches (default: one per stage).
    Returns ``boundaries [S, B, ...]``: the activation at each stage
    boundary (stage s = after block (s+1)·L/S) for the whole batch;
    ``boundaries[-1]`` is the pipeline output.
    """
    S = int(mesh.shape[axis])
    L = int(jax.tree.leaves(stacked_params)[0].shape[0])
    assert L % S == 0, f"{L} blocks must divide over {S} stages"
    B = x.shape[0]
    M = int(n_micro) if n_micro else S
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    mb = B // M
    rest = x.shape[1:]
    x_m = x.reshape(M, mb, *rest)

    # [L, ...] -> [S, L/S, ...]: leading dim sharded one stage per device
    stk = jax.tree.map(
        lambda a: a.reshape(S, L // S, *a.shape[1:]), stacked_params
    )

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    blocks_per_stage = L // S
    use_rng = rng is not None
    if not use_rng:
        rng = jax.random.PRNGKey(0)  # unused, keeps one code path

    def worker(stk_local, x_all, rng_):
        idx = lax.axis_index(axis)
        local = jax.tree.map(lambda a: a[0], stk_local)  # [L/S, ...]
        state = jnp.zeros((mb, *rest), x_all.dtype)
        outs = jnp.zeros((M, mb, *rest), x_all.dtype)

        def apply_stage(state, m):
            def body(tok, sl):
                i, p = sl
                if use_rng:
                    k = jax.random.fold_in(
                        jax.random.fold_in(rng_, idx * blocks_per_stage + i), m
                    )
                    return block_apply(p, tok, k), None
                return block_apply(p, tok), None

            out, _ = lax.scan(
                body, state, (jnp.arange(blocks_per_stage), local)
            )
            return out

        def step(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped; writes masked below)
            fresh = lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            state = jnp.where(idx == 0, fresh, state)
            m = t - idx  # the microbatch THIS stage works on at time t
            state = apply_stage(state, jnp.clip(m, 0, M - 1))
            valid = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            cur = lax.dynamic_index_in_dim(outs, mc, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, state, cur), mc, 0
            )
            # hand the activation to the next stage (ICI neighbor hop)
            state = lax.ppermute(
                state, axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (state, outs), None

        (_, outs), _ = lax.scan(
            step, (state, outs), jnp.arange(M + S - 1)
        )
        return outs[None]  # [1, M, mb, ...] -> stacked to [S, ...] outside

    specs_params = jax.tree.map(lambda _: P(axis), stk)
    boundaries = shard_map(
        worker,
        mesh=mesh,
        in_specs=(specs_params, P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )(stk, x_m, rng)
    # [S, M, mb, ...] -> [S, B, ...]
    return boundaries.reshape(S, B, *rest)


# -- UNETR integration ------------------------------------------------------


def unetr_pp_forward(
    model,
    variables,
    x,
    mesh,
    train: bool = False,
    n_micro: Optional[int] = None,
    rngs: Optional[dict] = None,
    mutable: bool = False,
    axis: str = "stage",
):
    """UNETR forward with the transformer encoder pipelined over
    ``mesh[axis]`` (GPipe), everything else replicated.

    Functionally mirrors ``UNETR.__call__`` (models/three_d/unetr.py)
    submodule-by-submodule — same param names, equivalence-tested in
    tests/test_pp.py.  Eval mode is exact vs the sequential model; train
    mode uses per-(block, microbatch) dropout folding (a different but
    equally valid dropout stream).  With ``mutable=True`` returns
    ``(logits, {'batch_stats': ...})`` like ``model.apply``.
    """
    from ..models.three_d.unetr import (
        _ConvBNReLU,
        _DeconvBlock,
        _SelfAttention,
        _TransformerBlock,
    )
    from ..nn.blocks import TorchConv, TorchConvTranspose

    S = int(mesh.shape[axis])
    L = int(model.num_layers)
    ext_layers = (3, 6, 9, 12)
    bps = L // S
    assert L % S == 0 and all(e % bps == 0 for e in ext_layers), (
        f"extraction layers {ext_layers} must align with stage boundaries "
        f"(L={L}, S={S})"
    )

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    kw = dict(init_type=model.init_type, dtype=model.dtype)
    new_stats: dict = {}

    def apply_sub(mod, name, h, *args, has_stats=False, **kwargs):
        vs = {"params": params[name]}
        if has_stats:
            vs["batch_stats"] = stats[name]
        if has_stats and train:
            out, upd = mod.apply(
                vs, h, *args, mutable=["batch_stats"], rngs=rngs, **kwargs
            )
            new_stats[name] = upd["batch_stats"]
            return out
        return mod.apply(vs, h, *args, rngs=rngs, **kwargs)

    patch_dim = tuple(s // model.patch_size for s in model.img_shape)
    n_patches = int(np.prod(patch_dim))

    # patch embed + position embeddings (unetr.py:131-142)
    tokens = apply_sub(
        TorchConv(
            features=model.embed_dim, kernel_size=model.patch_size,
            stride=model.patch_size, **kw,
        ),
        "TorchConv_0", x,
    )
    b = tokens.shape[0]
    tokens = tokens.reshape(b, n_patches, model.embed_dim)
    tokens = tokens + params["position_embeddings"].astype(tokens.dtype)
    drop_rng = (rngs or {}).get("dropout")
    if train and drop_rng is not None:
        keep = 1.0 - model.dropout
        mask = jax.random.bernoulli(
            jax.random.fold_in(drop_rng, 2**31 - 1), keep, tokens.shape
        )
        tokens = jnp.where(mask, tokens / keep, 0).astype(tokens.dtype)

    # pipelined encoder: 12 identical blocks over the stage axis
    stacked = stack_blocks(params, "_TransformerBlock_", L)
    block_mod = _TransformerBlock(
        model.embed_dim, model.num_heads, model.dropout, model.dtype
    )

    if train and drop_rng is not None:

        def block_apply(p, tok, k):
            return block_mod.apply(
                {"params": p}, tok, True, rngs={"dropout": k}
            )

        boundaries = gpipe(
            block_apply, stacked, tokens, mesh, axis=axis,
            n_micro=n_micro, rng=drop_rng,
        )
    else:

        def block_apply(p, tok):
            return block_mod.apply({"params": p}, tok, False)

        boundaries = gpipe(
            block_apply, stacked, tokens, mesh, axis=axis, n_micro=n_micro
        )

    z3, z6, z9, z12 = [
        boundaries[e // bps - 1].reshape(b, *patch_dim, model.embed_dim)
        for e in ext_layers
    ]

    # decoder pyramid, mirroring unetr.py:155-189 submodule order exactly
    conv_i, deconv_i, dblock_i = [0], [0], [0]

    def conv_block(f, h):
        name = f"_ConvBNReLU_{conv_i[0]}"
        conv_i[0] += 1
        return apply_sub(
            _ConvBNReLU(f, 3, model.init_type, model.dtype), name, h, train,
            has_stats=True,
        )

    def deconv(f, h):
        name = f"TorchConvTranspose_{deconv_i[0]}"
        deconv_i[0] += 1
        return apply_sub(
            TorchConvTranspose(features=f, kernel_size=2, stride=2, **kw),
            name, h,
        )

    def deconv_block(f, h):
        name = f"_DeconvBlock_{dblock_i[0]}"
        dblock_i[0] += 1
        return apply_sub(
            _DeconvBlock(f, model.init_type, model.dtype), name, h, train,
            has_stats=True,
        )

    z12 = deconv(512, z12)
    z9 = deconv_block(512, z9)
    y = jnp.concatenate([z9, z12], axis=-1)
    for f in (512, 512, 512):
        y = conv_block(f, y)
    z9u = deconv(256, y)

    z6d = z6
    for f in (512, 256):
        z6d = deconv_block(f, z6d)
    y = jnp.concatenate([z6d, z9u], axis=-1)
    for f in (256, 256):
        y = conv_block(f, y)
    z6u = deconv(128, y)

    z3d = z3
    for f in (512, 256, 128):
        z3d = deconv_block(f, z3d)
    y = jnp.concatenate([z3d, z6u], axis=-1)
    for f in (128, 128):
        y = conv_block(f, y)
    z3u = deconv(64, y)

    z0 = conv_block(32, x)
    z0 = conv_block(64, z0)
    y = jnp.concatenate([z0, z3u], axis=-1)
    y = conv_block(64, y)
    y = conv_block(64, y)
    out = apply_sub(
        TorchConv(features=model.output_dim, kernel_size=1, **kw),
        "TorchConv_1", y,
    )
    out = out.astype(jnp.float32)
    if mutable:
        merged = dict(stats)
        merged.update(new_stats)
        return out, {"batch_stats": merged}
    return out
