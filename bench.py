#!/usr/bin/env python
"""Benchmark: 3-D U-Net training throughput (patches/sec) on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patches/sec", "vs_baseline": N}

Baseline (BASELINE.md north star): >= 2000 patches/sec on a v5p-8 (8 chips)
with 128^3 patches. This harness runs on whatever jax.devices() offers (a
single v5e chip under the driver) and reports absolute patches/sec;
vs_baseline is value / (2000 / 8 * n_chips), i.e. scaled to the per-chip
share of the 8-chip target so the number is comparable across pool sizes.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import UNet3D
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_batch,
    )

    n_dev = len(jax.devices())
    patch = 128
    config = ConfigDict(
        {
            "network": "unet",
            "in_classes": 1,
            "out_classes": 2,
            "patch_size": (patch, patch, patch),
            "init_lr": 1e-3,
            "init_type": "kaiming",
            "precision": "bfloat16",
            "seed": 0,
        }
    )
    model = UNet3D.from_config(config)
    rng = jax.random.PRNGKey(0)
    params, batch_stats, opt_state, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    mesh = make_mesh("data=-1")
    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)

    # find the largest batch that fits (per 16G-HBM chip this lands at 2-4)
    for bs_per_chip in (4, 2, 1):
        bs = bs_per_chip * n_dev
        try:
            x = np.random.default_rng(0).normal(size=(bs, patch, patch, patch, 1)).astype(np.float32)
            y = (np.random.default_rng(1).uniform(size=(bs, patch, patch, patch, 1)) > 0.5).astype(np.float32)
            batch = shard_batch(mesh, {"x": x, "y": y})
            for _ in range(3):  # compile + warmup
                params, batch_stats, opt_state, loss, dice = step(
                    params, batch_stats, opt_state, batch["x"], batch["y"], rng
                )
            jax.block_until_ready(loss)
            break
        except Exception as e:  # OOM -> halve batch
            msg = str(e).lower()
            if any(s in msg for s in ("resource_exhausted", "exhausted", "out of memory", "oom")):
                continue
            raise
    else:
        raise RuntimeError("could not fit even bs=1 per chip")

    n_steps = 10
    start = time.perf_counter()
    for _ in range(n_steps):
        params, batch_stats, opt_state, loss, dice = step(
            params, batch_stats, opt_state, batch["x"], batch["y"], rng
        )
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - start
    patches_per_sec = bs * n_steps / elapsed

    per_chip_target = 2000.0 / 8.0 * n_dev
    print(
        json.dumps(
            {
                "metric": f"unet3d_{patch}cubed_train_throughput_bs{bs}_chips{n_dev}",
                "value": round(patches_per_sec, 2),
                "unit": "patches/sec",
                "vs_baseline": round(patches_per_sec / per_chip_target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
