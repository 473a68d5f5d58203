"""Paired A/B of the dilated tap-grouped conv inside full train steps.

Times the highresnet train step (its dilation-2/4 stages are the only
dilated convs in the zoo) with the new dilated-eligible routing vs the
old native-conv3d fallback, interleaved in one process (single runs on
the tunneled transport vary +-40%; paired comparisons are the only valid
measurement — see CLAUDE.md).
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

ELIGIBLE = c3.eligible


def eligible_no_dilation(kernel_size, stride, dilation, groups):
    if tuple(dilation) != (1, 1, 1):
        return False
    return ELIGIBLE(kernel_size, stride, dilation, groups)


def build(network, patch, variant):
    c3.eligible = ELIGIBLE if variant == "dilated-tapgroup" else eligible_no_dilation
    config = bench._config(network, patch)
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    raw = make_train_step(config, model, tx)
    step = jax.jit(lambda p, s, o, x, y, r: raw(p, s, o, x, y, r))  # fresh cache key
    x = jax.random.normal(jax.random.fold_in(rng, 1), (1, patch, patch, patch, 1), jnp.float32)
    y = (jax.random.uniform(jax.random.fold_in(rng, 2), (1, patch, patch, patch, 1)) > 0.5).astype(jnp.float32)
    state = [params, stats, opt]

    def run(n=8):
        c3.eligible = ELIGIBLE if variant == "dilated-tapgroup" else eligible_no_dilation
        p, s, o = state
        p, s, o, loss, dice = step(p, s, o, x, y, rng)
        _ = float(loss)  # hard sync
        t0 = time.perf_counter()
        for _ in range(n):
            p, s, o, loss, dice = step(p, s, o, x, y, rng)
        _ = float(loss)
        state[:] = [p, s, o]
        return (time.perf_counter() - t0) / n

    return run


def main():
    network = sys.argv[1] if len(sys.argv) > 1 else "highresnet"
    patch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print(f"devices: {jax.devices()}", flush=True)
    runs = {}
    for variant in ("dilated-tapgroup", "native"):
        print(f"compile {variant}...", flush=True)
        t0 = time.perf_counter()
        runs[variant] = build(network, patch, variant)
        runs[variant](1)
        print(f"  compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)
    for rep in range(3):
        for variant in ("dilated-tapgroup", "native"):
            dt = runs[variant](8)
            print(f"{network} {patch}^3 {variant} rep{rep}: {dt*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
