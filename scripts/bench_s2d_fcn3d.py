"""Paired A/B of the space-to-depth small-channel conv route on fcn3d.

The r4 roofline measured fcn3d's 64^3 train step at 926 ms, 38.6 GB/s
(4.7% HBM BW), 0.2% MFU — the padding-60 stem inflates 64^3 to 182^3 at
8-16 channels, where channels-last lane padding moves 16x the logical
bytes. conv3d_s2d folds 2x2x2 space into channels (exact); this times
the full fcn3d train step with GMIST_S2D_CONV on vs off, interleaved in
one process (tunnel variance is +-40% — paired only).

Run: python scripts/bench_s2d_fcn3d.py [fcn3d] [64]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
from general_medical_image_segmentation_cnn_framework_tpu.train import (
    init_train_state,
    make_train_step,
)


def build(network, patch, s2d: bool):
    os.environ["GMIST_S2D_CONV"] = "1" if s2d else ""
    config = bench._config(network, patch)
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    raw = make_train_step(config, model, tx)
    step = jax.jit(lambda p, s, o, x, y, r: raw(p, s, o, x, y, r))
    x = jax.random.normal(
        jax.random.fold_in(rng, 1), (1, patch, patch, patch, 1), jnp.float32
    )
    y = (
        jax.random.uniform(jax.random.fold_in(rng, 2), (1, patch, patch, patch, 1))
        > 0.5
    ).astype(jnp.float32)
    state = [params, stats, opt]

    def run(n=8):
        # env must be right whenever jit can retrace
        os.environ["GMIST_S2D_CONV"] = "1" if s2d else ""
        p, s, o = state
        p, s, o, loss, dice = step(p, s, o, x, y, rng)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            p, s, o, loss, dice = step(p, s, o, x, y, rng)
        _ = float(loss)
        state[:] = [p, s, o]
        return (time.perf_counter() - t0) / n

    return run


if __name__ == "__main__":
    plat = os.environ.get("GMIST_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    network = sys.argv[1] if len(sys.argv) > 1 else "fcn3d"
    patch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print(f"devices: {jax.devices()}", flush=True)
    runs = {}
    for name, s2d in (("s2d", True), ("off", False)):
        print(f"compile {name}...", flush=True)
        t0 = time.perf_counter()
        runs[name] = build(network, patch, s2d)
        runs[name](1)
        print(f"  compiled+warm in {time.perf_counter() - t0:.0f}s", flush=True)
    for rep in range(3):
        for name in runs:
            dt = runs[name](8)
            print(
                f"{network} {patch}^3 {name} rep{rep}: {dt * 1e3:.1f} ms/step",
                flush=True,
            )
