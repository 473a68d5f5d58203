"""Stage breakdown of the sliding-window predict path on real hardware.

Answers: of the ~1 s/volume the primary bench measures, how much is
(a) host->device volume upload (f32 vs bf16), (b) the jitted tile scan,
(c) device->host int8 mask download?  If (a) dominates on the tunneled
transport, routing the sliding-window path through a bf16 upload (like
whole_volume_predict's input_dtype already does) is a direct primary-
metric win.

All timings are paired/interleaved in one process (tunnel variance
+-40%); dispatch n reps then one hard sync (per-rep syncs add ~25-30 ms
transport latency each, CLAUDE.md r5).

Usage: python scripts/profile_predict_stages.py [n_reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    vol_shape = (256, 256, 128)
    patch = 128
    config = bench._config("unet", patch)
    config.batch_size = 1
    model = build_model(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": stats}
    forward = make_forward_fn(config, model)

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((1, *vol_shape), dtype=np.float32)
    overlap = tuple(p // 2 for p in (patch,) * 3)

    # warm every program once
    m_f32 = sw.sliding_window_predict(
        forward, variables, vol, (patch,) * 3, overlap, batch_size=1
    )

    vol_xyzc = np.moveaxis(vol, 0, -1)
    vol_bf16 = vol_xyzc.astype(ml_dtypes.bfloat16)

    spatial = vol.shape[1:]
    locations = sw.grid_locations(spatial, (patch,) * 3, overlap)
    starts = locations[:, :3].astype(np.int32)
    starts_dev = jnp.asarray(starts)
    n_tiles = len(locations)
    print(f"tiles per volume: {n_tiles}")

    def timed(label, fn, n=reps):
        fn()  # warm
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        if out is not None and hasattr(out, "ravel") and hasattr(out, "devices"):
            sync(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:34s} {dt:8.1f} ms")
        return dt

    # --- stage timings (interleaved order repeated 3x for pairing) ---
    for round_i in range(3):
        print(f"--- round {round_i} ---")
        timed("upload f32 (32MB)", lambda: jnp.asarray(vol_xyzc))
        timed("upload bf16 (16MB)", lambda: jnp.asarray(vol_bf16))

        vol_dev = jnp.asarray(vol_xyzc)
        sync(vol_dev)
        vol_dev_bf = jnp.asarray(vol_bf16)
        sync(vol_dev_bf)

        def scan_only(v=vol_dev):
            return sw._predict_volume_crop(
                forward, variables, v, starts_dev, (patch,) * 3, 1,
                overlap, None, None,
            )

        timed("tile scan (device, f32 vol)", scan_only)
        timed("tile scan (device, bf16 vol)", lambda: scan_only(vol_dev_bf))

        mask_dev = scan_only()
        sync(mask_dev)

        def download():
            np.asarray(mask_dev)
            return None

        timed("mask download (int8 8MB)", download)

        def e2e_f32():
            np.asarray(
                sw.sliding_window_predict(
                    forward, variables, vol, (patch,) * 3, overlap, batch_size=1
                )
            )
            return None

        timed("end-to-end f32 upload", e2e_f32, n=max(2, reps // 2))

    # exactness: bf16-gathered tiles vs f32
    m_bf16 = np.asarray(
        sw._predict_volume_crop(
            forward, variables, jnp.asarray(vol_bf16), starts_dev,
            (patch,) * 3, 1, overlap, None, None,
        )
    )
    diff = int((m_f32[0] != m_bf16).sum())
    print(f"bf16-upload mask mismatches vs f32: {diff} / {m_bf16.size}")


if __name__ == "__main__":
    main()
