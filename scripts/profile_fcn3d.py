"""Per-layer profile of the fcn3d 64^3 train step (VERDICT r3 #5).

The r4 HW roofline measured the whole step at 926 ms / 38.6 GB/s (4.7%
HBM BW) / 0.2% MFU — bound by neither modeled bytes nor FLOPs, i.e.
some layer is layout-pathological. Prime suspect: the padding-60 stem
blows 64^3 up to 182^3 at 8-16 channels, where channels-last lane
padding makes XLA move 16x the logical bytes on the largest tensors of
the net (r2 precedent: the Cin=1 unet stem).

This times each suspect op standalone (fwd and fwd+bwd, paired in one
process, float() hard sync) through the same TorchConv routing the
model uses, so the ranking is attributable.

Run: python scripts/profile_fcn3d.py [--reps 5]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(fn, args, reps):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from flax import linen as nn

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.fcn3d import (
        FCN3D,
        _ceil_pool,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import TorchConv

    print(f"devices: {jax.devices()}", flush=True)
    rng = jax.random.PRNGKey(0)

    # (name, spatial, cin, cout, k, p) — fcn3d's stages at 64^3 input
    cases = [
        ("stem p60 1->8 @64", 64, 1, 8, 3, 60),
        ("conv 8->8 @182", 182, 8, 8, 3, 1),
        ("conv p15 8->16 @91", 91, 8, 16, 3, 15),
        ("conv 16->16 @119", 119, 16, 16, 3, 1),
        ("conv 16->32 @60", 60, 16, 32, 3, 1),
        ("conv 32->32 @60", 60, 32, 32, 3, 1),
        ("conv 32->64 @30", 30, 32, 64, 3, 1),
        ("conv 64->64 @30", 30, 64, 64, 3, 1),
        ("conv 64->64 @15", 15, 64, 64, 3, 1),
        ("fc6 k7 64->512 @8", 8, 64, 512, 7, 0),
    ]
    for name, s, cin, cout, k, p in cases:
        m = TorchConv(features=cout, kernel_size=k, padding=p, dtype=dtype)
        x = jax.random.normal(rng, (1, s, s, s, cin), dtype)
        v = m.init(rng, x)

        fwd = jax.jit(lambda v, x, m=m: m.apply(v, x))
        t_f = timed(fwd, (v, x), args.reps)

        def fb(v, x, m=m):
            def f(v, x):
                y = m.apply(v, x)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(f, argnums=(0, 1))(v, x)
            return l, g

        t_b = timed(jax.jit(fb), (v, x), args.reps)
        print(f"{name:26s} fwd {t_f * 1e3:8.2f} ms   fwd+bwd {t_b * 1e3:8.2f} ms", flush=True)

    # pools on the big tensors
    for name, s, c in [("ceil_pool @182 c8", 182, 8), ("ceil_pool @119 c16", 119, 16)]:
        x = jax.random.normal(rng, (1, s, s, s, c), dtype)
        t = timed(jax.jit(_ceil_pool), (x,), args.reps)
        print(f"{name:26s} fwd {t * 1e3:8.2f} ms", flush=True)

    # whole model fwd + step for the total
    model = FCN3D(in_channels=1, n_class=1, dtype=dtype)
    x = jax.random.normal(rng, (1, 64, 64, 64, 1), dtype)
    v = jax.jit(model.init, static_argnames="train")(rng, x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    print(f"{'whole fwd @64':26s} fwd {timed(fwd, (v, x), args.reps) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
