#!/usr/bin/env python
"""Paired A/B: dispatch-ORDERED prefetch upload vs free-running prefetch.

Both arms run the bf16 pipelined sliding-window path (BASELINE.md r6).
The only difference: arm B gates the loader's host->device upload on the
scan dispatch (sliding_window_predict on_dispatch semaphore), so the bulk
transfer can never land on the wire between mask-fetch and the next
dispatch (which serializes the dispatch behind ~200 ms of upload on
single-connection transports — the hypothesized residual in the r6
pipelined number: 415-502 ms/vol vs the ~230 ms max(upload, scan) floor).

Interleaved rounds; medians per arm per round. Run on live HW:
    timeout 1800 python scripts/ab_ordered_upload.py
"""

import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N_VOLS = 6
ROUNDS = 4
SHAPE = (256, 256, 128)
PATCH = 128


def main():
    from general_medical_image_segmentation_cnn_framework_tpu.models import (
        build_model,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        prepare_volume,
        sliding_window_predict,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.predict import (
        make_forward_fn,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
    )

    import bench

    config = bench._config("unet", PATCH)
    config.batch_size = 1
    model = build_model(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": stats}
    forward = make_forward_fn(config, model)
    vol = (
        np.random.default_rng(0)
        .normal(size=(1,) + SHAPE)
        .astype(np.float32)
    )
    overlap = (4, 4, 36)

    def run(vol_dev, on_dispatch=None, sync=True):
        return sliding_window_predict(
            forward, variables, vol_dev, (PATCH,) * 3, overlap,
            batch_size=1, on_dispatch=on_dispatch, sync=sync,
        )

    print("warming compiled scan ...", flush=True)
    run(prepare_volume(vol, jnp.bfloat16))

    def arm(ordered: bool, deferred: bool = False) -> float:
        q: queue.Queue = queue.Queue(maxsize=2)
        sem = threading.Semaphore(1)

        def loader():
            for _ in range(N_VOLS):
                if ordered:
                    sem.acquire()
                q.put(prepare_volume(vol, jnp.bfloat16))

        t = threading.Thread(target=loader, daemon=True)
        pending = None
        t.start()
        t0 = time.perf_counter()
        for _ in range(N_VOLS):
            out = run(
                q.get(),
                on_dispatch=(sem.release if ordered else None),
                sync=not deferred,
            )
            if deferred:
                if pending is not None:
                    pending()  # fetch mask i-1 while scan i runs
                pending = out
        if pending is not None:
            pending()
        total = time.perf_counter() - t0
        t.join()
        return total / N_VOLS

    for r in range(ROUNDS):
        a = arm(ordered=False)
        b = arm(ordered=True)
        c = arm(ordered=True, deferred=True)
        print(
            f"round {r}: free {a * 1e3:7.1f} ms/vol ({60 / a:6.1f}/min) | "
            f"ordered {b * 1e3:7.1f} ({60 / b:6.1f}/min) | "
            f"ordered+deferred {c * 1e3:7.1f} ({60 / c:6.1f}/min) | "
            f"best ratio {a / min(b, c):5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
