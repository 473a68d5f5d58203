"""Serving-path hardware smoke: resident Predictor latency + jax.export
artifact roundtrip on the live TPU.

Answers: (a) does the serving layer run on the axon platform, (b) what
is the resident per-volume latency vs the batch driver's pipelined
number, (c) does an exported StableHLO artifact deserialize + run on
device with identical masks?

Usage: python scripts/hw_serving_smoke.py [n_volumes]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax

import bench
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
from general_medical_image_segmentation_cnn_framework_tpu.serving import (
    Predictor,
    export_predictor,
    load_exported_predictor,
)
from general_medical_image_segmentation_cnn_framework_tpu.train import (
    init_train_state,
)
from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
    ZNormalization,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spatial = (256, 256, 128)
    config = bench._config("unet", 128)
    config.batch_size = 1
    model = build_model(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": stats}

    pred = Predictor(config, model=model, variables=variables)
    rng = np.random.default_rng(0)
    vols = [
        rng.standard_normal((1, *spatial), dtype=np.float32) for _ in range(n)
    ]

    print("warmup (compile)...", flush=True)
    t0 = time.perf_counter()
    pred.warmup(spatial)
    print(f"warmup {time.perf_counter() - t0:.1f} s", flush=True)

    # resident latency, synchronous (the serve loop's per-file cost)
    for r in range(2):
        t0 = time.perf_counter()
        for v in vols:
            pred.predict_array(v)
        dt = (time.perf_counter() - t0) / n
        print(
            f"round {r}: resident sync predict {dt * 1e3:.0f} ms/vol "
            f"({60.0 / dt:.1f} vols/min)",
            flush=True,
        )

    # AOT artifact roundtrip on device
    t0 = time.perf_counter()
    blob = export_predictor(pred, spatial)
    print(
        f"export {len(blob) / 1e6:.2f} MB in {time.perf_counter() - t0:.1f} s",
        flush=True,
    )
    t0 = time.perf_counter()
    fn = load_exported_predictor(blob)
    znorm = ZNormalization()
    m_art = fn(variables, znorm.normalize_array(vols[0]))
    print(f"deserialize+first-call {time.perf_counter() - t0:.1f} s", flush=True)
    m_ref = pred.predict_array(vols[0])
    diff = int((m_art != m_ref).sum())
    print(f"artifact mask mismatches: {diff} / {m_ref.size}")
    t0 = time.perf_counter()
    for v in vols:
        fn(variables, znorm.normalize_array(v))
    dt = (time.perf_counter() - t0) / n
    print(f"artifact warm predict {dt * 1e3:.0f} ms/vol ({60.0 / dt:.1f} vols/min)")


if __name__ == "__main__":
    main()
