"""Generic paired A/B of an env-gated conv route inside a full train step.

Usage:
    python scripts/bench_env_ab.py KEY=VALUE [network] [patch]

Times the full train step with the env var set vs unset, interleaved in
one process (tunnel variance +-40%: paired only). The env is re-applied
around every run because TorchConv reads it at trace time.

Examples:
    python scripts/bench_env_ab.py GMIST_IM2COL_VOXELS=32768 unet 128
    python scripts/bench_env_ab.py GMIST_S2D_CONV=1 fcn3d 64
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


def build(network, patch, key, value):
    if value is None:
        os.environ.pop(key, None)
    else:
        os.environ[key] = value
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
        if value is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = value
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
    assert len(sys.argv) >= 2 and "=" in sys.argv[1], __doc__
    key, value = sys.argv[1].split("=", 1)
    network = sys.argv[2] if len(sys.argv) > 2 else "unet"
    patch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    print(f"devices: {jax.devices()}", flush=True)
    runs = {}
    for name, val in ((key.lower(), value), ("off", None)):
        print(f"compile {name}...", flush=True)
        t0 = time.perf_counter()
        runs[name] = build(network, patch, key, val)
        runs[name](1)
        print(f"  compiled+warm in {time.perf_counter() - t0:.0f}s", flush=True)
    for rep in range(3):
        for name in runs:
            dt = runs[name](8)
            print(
                f"{network} {patch}^3 {name} rep{rep}: {dt * 1e3:.1f} ms/step",
                flush=True,
            )
