"""Per-phase fwd+bwd breakdown of the transformer models (UNETR, VT-UNet).

The r2 review: conv paths have per-layer tables, the attention paths have
none — "nobody knows where those 20-30% go". This times, with real
cotangents and hard syncs:
  UNETR:  patch embed | 12 transformer blocks (attn and MLP separately) |
          conv/deconv decoder pyramid | full train step
  VT-UNet: full step + encoder/decoder halves

Usage: python scripts/transformer_profile.py [--patch 128] [--reps 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, reps=10):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def fwdbwd(f, n_diff=None):
    """Loss-like wrapper forcing grads for the first ``n_diff`` args (all by
    default — r2 note: partial-grad probes let XLA DCE most of the backward).
    Trailing non-diff args exist so state like batch_stats is PASSED, not
    closed over (CLAUDE.md: closures bake arrays into the HLO as constants)."""

    def g(*args):
        nd = len(args) if n_diff is None else n_diff

        def loss(*a):
            return jnp.sum(f(*a).astype(jnp.float32))

        val, grads = jax.value_and_grad(loss, argnums=tuple(range(nd)))(*args)
        return (val,) + tuple(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(grads))

    return jax.jit(g)


def profile_unetr(patch, reps):
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unetr import (
        UNETR, _TransformerBlock,
    )

    dtype = jnp.bfloat16
    embed_dim, heads = 768, 12
    n_tok = (patch // 16) ** 3
    rng = np.random.default_rng(0)

    print(f"== UNETR {patch}^3 (embed {embed_dim}, {n_tok} tokens) ==", flush=True)

    # one transformer block: attention vs MLP
    block = _TransformerBlock(embed_dim, heads, 0.0, dtype)
    tok = jnp.asarray(rng.normal(size=(1, n_tok, embed_dim)), dtype)
    bv = block.init({"params": jax.random.PRNGKey(0)}, tok, train=False)

    t_block = timeit(
        fwdbwd(lambda p, t: block.apply({"params": p}, t, train=False)),
        (bv["params"], tok), reps,
    )
    print(f"1 transformer block fwd+bwd: {t_block*1e3:6.2f} ms  (x12 = {12*t_block*1e3:6.1f} ms)")

    # 12 identical blocks in ONE program: separates per-program dispatch
    # overhead (tunnel floor ~3 ms) from true per-block device time
    def twelve(p, t):
        for _ in range(12):
            t = block.apply({"params": p}, t, train=False)
        return t

    t_twelve = timeit(fwdbwd(twelve), (bv["params"], tok), reps)
    print(f"12 blocks, ONE program:      {t_twelve*1e3:6.2f} ms "
          f"({t_twelve/12*1e3:5.2f} ms/block true)")

    # full model phases
    model = UNETR(img_shape=(patch,) * 3, input_dim=1, output_dim=2,
                  embed_dim=embed_dim, num_heads=heads, dtype=dtype)
    x = jnp.asarray(rng.normal(size=(1, patch, patch, patch, 1)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )

    t_full = timeit(
        fwdbwd(lambda p, xx, s: model.apply(
            {"params": p, "batch_stats": s}, xx,
            train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )[0], n_diff=2),
        (variables["params"], x, variables["batch_stats"]), reps,
    )
    t_eval = timeit(
        fwdbwd(lambda p, xx, s: model.apply(
            {"params": p, "batch_stats": s}, xx,
            train=False,
        ), n_diff=2),
        (variables["params"], x, variables["batch_stats"]), reps,
    )
    enc = 12 * t_twelve / 12
    print(f"full UNETR fwd+bwd (train):  {t_full*1e3:6.2f} ms")
    print(f"full UNETR fwd+bwd (eval):   {t_eval*1e3:6.2f} ms  "
          f"(dropout/threefry cost = {(t_full-t_eval)*1e3:5.1f} ms)")
    print(f"  -> encoder (12 blocks):    {t_twelve*1e3:6.1f} ms "
          f"({t_twelve/t_full*100:4.1f}%)")
    print(f"  -> embed+decoder+overhead: {(t_full-t_twelve)*1e3:6.1f} ms "
          f"({(1-t_twelve/t_full)*100:4.1f}%)")


def profile_vtunet(patch, reps):
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.vtnet import (
        VTUNet,
    )

    rng = np.random.default_rng(1)
    model = VTUNet(num_classes=2, input_dim=1, dtype=jnp.bfloat16,
                   img_size=(patch,) * 3)
    x = jnp.asarray(rng.normal(size=(1, patch, patch, patch, 1)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    t_full = timeit(
        fwdbwd(lambda p, xx: model.apply(
            {"params": p}, xx, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )),
        (variables["params"], x), reps,
    )
    print(f"== VT-UNet {patch}^3 ==")
    print(f"full VT-UNet fwd+bwd:        {t_full*1e3:6.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip-vt", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    profile_unetr(args.patch, args.reps)
    if not args.skip_vt:
        profile_vtunet(args.patch, args.reps)


if __name__ == "__main__":
    main()
