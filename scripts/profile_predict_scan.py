"""Decompose the sliding-window tile SCAN (the ~230 ms/volume device
program) into its parts on real hardware.

The r6 stage profile showed the scan is now the predict floor (upload
hides behind it; the bit-packed mask fetch is tiny).  Pure unet forward
at 128^3 measured ~25 ms in r2, so 4 tiles should cost ~100 ms of
forward — where do the other ~130 ms go?  Arms:

  1. fwd-only            jitted forward on ONE device-resident tile
  2. fwd+argmax          forward + channel argmax (the scan's per-tile math)
  3. scan, no writes     _forward_all_tiles: gather + fwd + argmax, stacked out
  4. scan + crop writes  _predict_volume_crop (the shipped path), pack=False
  5. scan + crop + pack  the shipped path, pack=True

All arms dispatch n reps then hard-sync once (per-rep syncs add ~25-30 ms
transport latency each, CLAUDE.md r5); order interleaved across 3 rounds.

Usage: python scripts/profile_predict_scan.py [n_reps]
"""

import sys
import time

sys.path.insert(0, ".")

import ml_dtypes
import numpy as np

import jax
import jax.numpy as jnp

import bench
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
from general_medical_image_segmentation_cnn_framework_tpu.ops import sliding_window as sw
from general_medical_image_segmentation_cnn_framework_tpu.predict import make_forward_fn
from general_medical_image_segmentation_cnn_framework_tpu.train import init_train_state


def sync(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    vol_shape = (256, 256, 128)
    patch = 128
    config = bench._config("unet", patch)
    config.batch_size = 1
    model = build_model(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": stats}
    forward = make_forward_fn(config, model)

    rng = np.random.default_rng(0)
    vol_xyzc = rng.standard_normal((*vol_shape, 1), dtype=np.float32).astype(
        ml_dtypes.bfloat16
    )
    overlap = (patch // 2,) * 3
    locations = sw.grid_locations(vol_shape, (patch,) * 3, overlap)
    starts = jnp.asarray(locations[:, :3].astype(np.int32))
    n_tiles = len(locations)
    print(f"tiles per volume: {n_tiles}")

    vol_dev = jnp.asarray(vol_xyzc)
    sync(vol_dev)
    tile = jax.lax.dynamic_slice(vol_dev, (0, 0, 0, 0), (patch, patch, patch, 1))[
        None
    ]
    tile = jax.block_until_ready(tile)
    sync(tile)

    fwd_jit = jax.jit(forward)

    @jax.jit
    def fwd_argmax(variables, t):
        return jnp.argmax(fwd_jit(variables, t), axis=-1).astype(jnp.int32)

    def timed(label, fn, n=reps):
        out = fn()  # warm (compile)
        if hasattr(out, "block_until_ready"):
            sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:34s} {dt:8.1f} ms", flush=True)
        return dt

    arms = [
        ("fwd-only (1 tile)", lambda: fwd_jit(variables, tile)),
        ("fwd+argmax (1 tile)", lambda: fwd_argmax(variables, tile)),
        (
            "scan no-writes (4 tiles)",
            lambda: sw._forward_all_tiles(
                forward, variables, vol_dev, starts, (patch,) * 3, 1
            ),
        ),
        (
            "scan+crop writes (shipped)",
            lambda: sw._predict_volume_crop(
                forward, variables, vol_dev, starts, (patch,) * 3, 1,
                overlap, None, None,
            ),
        ),
        (
            "scan+crop+pack (shipped)",
            lambda: sw._predict_volume_crop(
                forward, variables, vol_dev, starts, (patch,) * 3, 1,
                overlap, None, None, True,
            ),
        ),
    ]
    for round_i in range(3):
        print(f"--- round {round_i} ---")
        for label, fn in arms:
            timed(label, fn)


if __name__ == "__main__":
    main()
