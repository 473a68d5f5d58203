#!/usr/bin/env python
"""Benchmark on real hardware. Prints ONE JSON line (stdout):

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: sliding-window whole-volume inference throughput
(BASELINE.md target: >= 5 vols/min on a v5p-8). The companion train-step
throughput is printed to stderr and tracked in BASELINE.md — its stated
2,000 patches/sec target exceeds a v5p-8's total peak FLOPs for this
model (see BASELINE.md physics note), so vols/min is the meaningful
baseline comparison. vs_baseline = vols_per_min / 5.0 with the chip count
in the metric name (we measure on fewer, weaker chips than the target
hardware).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_train(n_steps=10):
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import UNet3D
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    patch = 128
    config = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": 2,
            "patch_size": (patch,) * 3, "init_lr": 1e-3,
            "init_type": "kaiming", "precision": "bfloat16", "seed": 0,
        }
    )
    model = UNet3D.from_config(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    bs = 1
    x = jnp.asarray(np.random.default_rng(0).normal(size=(bs, patch, patch, patch, 1)).astype(np.float32))
    y = jnp.asarray((np.random.default_rng(1).uniform(size=(bs, patch, patch, patch, 1)) > 0.5).astype(np.float32))
    for _ in range(3):
        params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
    float(loss)  # hard sync (block_until_ready unreliable on some transports)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
    float(loss)
    return bs * n_steps / (time.perf_counter() - t0)


def bench_inference(n_volumes=3, vol_shape=(256, 256, 128), patch=128, batch_size=2):
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import UNet3D
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        sliding_window_predict,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.predict import make_forward_fn
    from general_medical_image_segmentation_cnn_framework_tpu.train import init_train_state

    config = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": 2,
            "patch_size": (patch,) * 3, "init_lr": 1e-3,
            "init_type": "kaiming", "precision": "bfloat16", "seed": 0,
        }
    )
    model = UNet3D.from_config(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": stats}
    forward = make_forward_fn(config, model)
    vol = np.random.default_rng(0).normal(size=(1,) + tuple(vol_shape)).astype(np.float32)
    overlap = tuple(min(4, patch - 1) for _ in range(2)) + (min(36, patch - 1),)

    sliding_window_predict(forward, variables, vol, (patch,) * 3, overlap, batch_size=batch_size)
    times = []
    for _ in range(n_volumes):
        t0 = time.perf_counter()
        sliding_window_predict(forward, variables, vol, (patch,) * 3, overlap, batch_size=batch_size)
        times.append(time.perf_counter() - t0)
    return 60.0 / float(np.mean(times))


def main() -> None:
    n_dev = len(jax.devices())
    vols_per_min = bench_inference()
    try:
        pps = bench_train()
        print(
            f"[companion] unet3d 128^3 train: {pps:.1f} patches/sec on {n_dev} chip(s)",
            file=sys.stderr,
        )
    except Exception as e:  # train bench is informational; never fail the run
        print(f"[companion] train bench failed: {str(e)[:200]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"sliding_window_inference_256x256x128_unet3d_chips{n_dev}",
                "value": round(vols_per_min, 2),
                "unit": "vols/min",
                "vs_baseline": round(vols_per_min / 5.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
