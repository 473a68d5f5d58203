"""Shared paired-A/B harness for conv-routing experiments.

Times a full train step with a monkeypatched `ops.conv3d` symbol swapped
between a variant and a baseline, interleaved in ONE process — single
runs on the tunneled transport vary +-40%, so paired comparisons are the
only valid measurement (CLAUDE.md). Both bench_transpose_phased.py and
bench_dilated_tapgroup.py are thin declarations over this.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
import general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d as c3
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
from general_medical_image_segmentation_cnn_framework_tpu.train import (
    init_train_state,
    make_train_step,
)


def build(network, patch, attr, impl):
    """Train-step runner with ops.conv3d.<attr> monkeypatched to `impl`.

    The patch is (re)applied inside run() as well: jit retraces lazily,
    so the symbol must be correct whenever tracing can happen."""
    setattr(c3, attr, impl)
    config = bench._config(network, patch)
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    raw = make_train_step(config, model, tx)
    step = jax.jit(lambda p, s, o, x, y, r: raw(p, s, o, x, y, r))  # fresh cache key
    x = jax.random.normal(
        jax.random.fold_in(rng, 1), (1, patch, patch, patch, 1), jnp.float32
    )
    y = (
        jax.random.uniform(jax.random.fold_in(rng, 2), (1, patch, patch, patch, 1))
        > 0.5
    ).astype(jnp.float32)
    state = [params, stats, opt]

    def run(n=8):
        setattr(c3, attr, impl)
        p, s, o = state
        p, s, o, loss, dice = step(p, s, o, x, y, rng)
        _ = float(loss)  # hard sync (block_until_ready unreliable here)
        t0 = time.perf_counter()
        for _ in range(n):
            p, s, o, loss, dice = step(p, s, o, x, y, rng)
        _ = float(loss)
        state[:] = [p, s, o]
        return (time.perf_counter() - t0) / n

    return run


def run_ab(attr, variants, default_network, default_patch=64):
    """variants: {name: impl} (ordered); CLI: [network] [patch]."""
    import os

    plat = os.environ.get("GMIST_PLATFORM")
    if plat:  # CPU smoke runs while the tunnel is down
        jax.config.update("jax_platforms", plat)
    network = sys.argv[1] if len(sys.argv) > 1 else default_network
    patch = int(sys.argv[2]) if len(sys.argv) > 2 else default_patch
    print(f"devices: {jax.devices()}", flush=True)
    runs = {}
    for name, impl in variants.items():
        print(f"compile {name}...", flush=True)
        t0 = time.perf_counter()
        runs[name] = build(network, patch, attr, impl)
        runs[name](1)
        print(f"  compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)
    for rep in range(3):
        for name in variants:
            dt = runs[name](8)
            print(
                f"{network} {patch}^3 {name} rep{rep}: {dt*1e3:.1f} ms/step",
                flush=True,
            )
