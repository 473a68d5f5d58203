"""Paired A/B of the phased transposed conv inside full train steps.

Times the densenet (SkipDenseNet3D) train step with the new
conv_transpose_phased routing vs the old lhs_dilation route, interleaved
in one process (single runs on the tunneled transport vary +-40%; paired
comparisons are the only valid measurement — see CLAUDE.md).
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

PHASED = c3.conv_transpose_phased


def dilated(x, kernel, stride):
    n_sp = x.ndim - 2
    k = kernel.shape[:n_sp]
    spatial = "DHW"[3 - n_sp:]
    dn = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,) * n_sp,
        [(ki - 1, ki - 1) for ki in k], lhs_dilation=tuple(stride),
        dimension_numbers=dn,
    )


def build(network, patch, variant):
    c3.conv_transpose_phased = PHASED if variant == "phased" else dilated
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
        c3.conv_transpose_phased = PHASED if variant == "phased" else dilated
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
    network = sys.argv[1] if len(sys.argv) > 1 else "densenet"
    patch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print(f"devices: {jax.devices()}", flush=True)
    runs = {}
    for variant in ("phased", "dilated"):
        print(f"compile {variant}...", flush=True)
        t0 = time.perf_counter()
        runs[variant] = build(network, patch, variant)
        runs[variant](1)
        print(f"  compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)
    for rep in range(3):
        for variant in ("phased", "dilated"):
            dt = runs[variant](8)
            print(f"{network} {patch}^3 {variant} rep{rep}: {dt*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
