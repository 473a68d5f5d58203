#!/usr/bin/env python
"""Benchmark: 3-D U-Net training throughput (patches/sec) on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patches/sec", "vs_baseline": N}

Baseline (BASELINE.md north star): >= 2000 patches/sec on a v5p-8 with
128^3 patches. Physics note (recorded in BASELINE.md): a 128^3 train step
of this U-Net costs ~2.2 TFLOP/patch, so 2000 patches/s would need 4.4
PFLOPS sustained — above an entire v5p-8's peak. vs_baseline is therefore
reported against the per-chip share of the target (2000/8 per chip),
scaled by chip count, as an honest comparable ratio.

Sweeps (batch, remat) configs and reports the fastest.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _measure(model, config, bs, patch, n_steps=10):
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    rng = jax.random.PRNGKey(0)
    params, batch_stats, opt_state, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(bs, patch, patch, patch, 1)).astype(np.float32)
    )
    y = jnp.asarray(
        (np.random.default_rng(1).uniform(size=(bs, patch, patch, patch, 1)) > 0.5).astype(
            np.float32
        )
    )
    for _ in range(3):
        params, batch_stats, opt_state, loss, dice = step(
            params, batch_stats, opt_state, x, y, rng
        )
    float(loss)  # hard sync (block_until_ready is unreliable on some
    # experimental PJRT transports)
    start = time.perf_counter()
    for _ in range(n_steps):
        params, batch_stats, opt_state, loss, dice = step(
            params, batch_stats, opt_state, x, y, rng
        )
    float(loss)
    return bs * n_steps / (time.perf_counter() - start)


def main() -> None:
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import UNet3D

    n_dev = len(jax.devices())
    patch = 128
    config = ConfigDict(
        {
            "network": "unet",
            "in_classes": 1,
            "out_classes": 2,
            "patch_size": (patch,) * 3,
            "init_lr": 1e-3,
            "init_type": "kaiming",
            "precision": "bfloat16",
            "seed": 0,
        }
    )

    best = (0.0, None)
    for bs, remat in ((1, False), (4, True)):
        model = UNet3D(
            in_channels=1, out_channels=2, init_features=32,
            init_type="kaiming", dtype=jnp.bfloat16, remat=remat,
        )
        try:
            pps = _measure(model, config, bs * n_dev, patch)
        except Exception as e:
            msg = str(e).lower()
            if any(s in msg for s in ("exhausted", "out of memory", "oom", "http 500")):
                continue
            raise
        if pps > best[0]:
            best = (pps, (bs, remat))

    patches_per_sec, (bs, remat) = best[0], best[1]
    per_chip_target = 2000.0 / 8.0 * n_dev
    print(
        json.dumps(
            {
                "metric": f"unet3d_{patch}cubed_train_throughput_bs{bs * n_dev}_remat{int(remat)}_chips{n_dev}",
                "value": round(patches_per_sec, 2),
                "unit": "patches/sec",
                "vs_baseline": round(patches_per_sec / per_chip_target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
