"""Roofline the UNet3D 128^3 training step on the attached TPU.

For each U-Net level conv (and the whole train step) this measures:
  * wall time (paired interleaved timing, hard-sync via float()),
  * XLA's OWN accounting of HBM traffic ("bytes accessed") and FLOPs from
    ``compiled.cost_analysis()``,
  * achieved GB/s and TFLOP/s against the chip roofline,
and prints a table for BASELINE.md. The point (r2 review): "the step is
traffic-bound" must be a measurement, not a hypothesis.

v5e reference: ~819 GB/s HBM, ~197 TFLOP/s bf16.

Usage:  python scripts/roofline.py [--patch 128] [--feat 32] [--reps 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0
PEAK_TFLOPS = 197.0


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def _time_fn(fn, args, reps):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def _cost(fn, args):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "bytes": float(ca.get("bytes accessed", float("nan"))),
        "flops": float(ca.get("flops", float("nan"))),
    }


def bench_conv(name, shape_in, cin, cout, reps, dtype=jnp.bfloat16):
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_tapgrouped,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1,) + shape_in + (cin,)), dtype)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, dtype)
    ct = jnp.asarray(rng.normal(size=(1,) + shape_in + (cout,)), dtype)

    def fwdbwd(x, k, ct):
        def f(x, k):
            return jnp.sum(
                conv3d_tapgrouped(x, k).astype(jnp.float32) * ct.astype(jnp.float32)
            )

        loss, (gx, gk) = jax.value_and_grad(f, argnums=(0, 1))(x, k)
        return loss, jnp.sum(gx.astype(jnp.float32)), jnp.sum(gk.astype(jnp.float32))

    jf = jax.jit(fwdbwd)
    t = _time_fn(jf, (x, k, ct), reps)
    c = _cost(fwdbwd, (x, k, ct))
    # minimal traffic: read x, ct, k; write gx, gk (+ intermediate y read/write)
    bpe = np.dtype(np.float32).itemsize if dtype == jnp.float32 else 2
    n_vox = int(np.prod(shape_in))
    min_bytes = bpe * (n_vox * (2 * cin + 3 * cout) + 2 * 27 * cin * cout)
    report(name, t, c, min_bytes)
    return t, c


def report(name, t, c, min_bytes=None):
    gbps = c["bytes"] / t / 1e9
    tf = c["flops"] / t / 1e12
    line = (
        f"{name:28s} {t * 1e3:8.2f} ms  {c['bytes'] / 1e9:7.2f} GB "
        f"{gbps:7.1f} GB/s ({gbps / HBM_GBPS * 100:5.1f}%)  "
        f"{tf:6.1f} TF ({tf / PEAK_TFLOPS * 100:4.1f}%)"
    )
    if min_bytes is not None:
        line += f"  [min {min_bytes / 1e9:6.2f} GB -> xla moves {c['bytes'] / min_bytes:4.1f}x]"
    print(line, flush=True)


def bench_step(patch, feat, reps, network="unet"):
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    config = ConfigDict(
        {
            "network": network, "in_classes": 1, "out_classes": 2,
            "patch_size": (patch,) * 3, "init_lr": 1e-3,
            "init_type": "none", "precision": "bfloat16", "seed": 0,
            "batch_size": 1,
        }
    )
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    rngnp = np.random.default_rng(0)
    x = jnp.asarray(rngnp.normal(size=(1, patch, patch, patch, 1)), jnp.float32)
    y = jnp.asarray(
        (rngnp.uniform(size=(1, patch, patch, patch, 1)) > 0.5), jnp.float32
    )

    # time (non-donated copy trick: rebuild state each call is too slow;
    # donation means we must thread the state through)
    state = (params, stats, opt)
    out = step(*state, x, y, rng)
    state = out[:3]
    float(out[3])
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(*state, x, y, rng)
        state = out[:3]
    float(out[3])
    t = (time.perf_counter() - t0) / 10

    # cost analysis on a fresh lowering (same HLO)
    params2, stats2, opt2, tx2 = init_train_state(config, model, rng)
    step2 = make_train_step(config, model, tx2)
    lowered = step2.lower(params2, stats2, opt2, x, y, rng)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    c = {"bytes": float(ca.get("bytes accessed", float("nan"))),
         "flops": float(ca.get("flops", float("nan")))}
    report(f"{network} {patch}^3 train step", t, c)
    return t, c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--network", default="unet",
                    help="any registry net; non-unet skips the per-level conv table "
                         "(VERDICT r3 #5: roofline densenet/fcn3d at --patch 64)")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    p = args.patch
    f = args.feat
    print(f"{'layer':28s} {'time':>10s}  {'bytes':>9s} {'achieved':>14s}  "
          f"{'flops':>12s}")
    levels = [
        ("enc1a 1->32 @128^3", (p, p, p), 1, f),
        ("enc1b 32->32 @128^3", (p, p, p), f, f),
        ("dec1a 64->32 @128^3", (p, p, p), 2 * f, f),
        ("enc2a 32->64 @64^3", (p // 2,) * 3, f, 2 * f),
        ("enc2b 64->64 @64^3", (p // 2,) * 3, 2 * f, 2 * f),
        ("dec2a 128->64 @64^3", (p // 2,) * 3, 4 * f, 2 * f),
        ("enc3b 128->128 @32^3", (p // 4,) * 3, 4 * f, 4 * f),
        ("enc4b 256->256 @16^3", (p // 8,) * 3, 8 * f, 8 * f),
        ("bottleneck 512 @8^3", (p // 16,) * 3, 16 * f, 16 * f),
    ]
    if args.network == "unet":
        for name, sh, cin, cout in levels:
            bench_conv(name, sh, cin, cout, args.reps)
    if not args.skip_step:
        bench_step(args.patch, args.feat, args.reps, network=args.network)


if __name__ == "__main__":
    main()
