"""Full-zoo train-step smoke: one number per registered network.

Refreshes BASELINE.md's "zoo hardware smoke" table (r2) after routing
changes (phased transposed conv, dilated tap-group, s2d, T-layout).
3-D nets run at [patch]^3 (default 64), 2-D nets at (1, 4*patch,
4*patch) through the driver's slice adapter. Per-net jit with a single
hard sync after the timed loop (amortized dispatch), median of reps.

Run: python scripts/bench_zoo.py [--patch 64] [--nets unet,vnet,...]
"""

import argparse
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--nets", default="")
    args = ap.parse_args()

    import os

    plat = os.environ.get("GMIST_PLATFORM")
    if plat:  # CPU smoke runs (sitecustomize pins the tunneled TPU)
        jax.config.update("jax_platforms", plat)

    import bench
    from general_medical_image_segmentation_cnn_framework_tpu.models import registry

    print(f"devices: {jax.devices()}", flush=True)
    names = (
        [n.strip() for n in args.nets.split(",") if n.strip()]
        or registry.available_models()
    )
    for name in names:
        is_2d = registry.is_2d(name)
        patch = (1, 4 * args.patch, 4 * args.patch) if is_2d else args.patch
        try:
            t0 = time.perf_counter()
            rate = bench.bench_train(name, patch=patch, n_steps=args.reps)
            dt = 1e3 / rate
            print(
                f"{name:16s} {'2d' if is_2d else '3d'} {dt:9.1f} ms/step "
                f"(compile+total {time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — smoke must survive one bad net
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
