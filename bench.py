#!/usr/bin/env python
"""Benchmark on real hardware. Prints ONE JSON line (stdout):

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "secondary": [...]}

Headline metric: sliding-window whole-volume inference throughput
(BASELINE.md target: >= 5 vols/min on a v5p-8). ``secondary`` carries the
train-step throughput of the flagship and the transformer families
(UNETR, VT-UNet) plus a VT-UNet inference number, so transformer-path
regressions show up in BENCH_r*.json (VERDICT r1 #7). The train-step
2,000 patches/sec target exceeds a v5p-8's total peak FLOPs for this
model (see BASELINE.md physics note), so vols/min is the meaningful
baseline comparison. vs_baseline = vols_per_min / 5.0 with the chip count
in the metric name (we measure on fewer, weaker chips than the target
hardware).
"""

import json
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _config(network, patch):
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict

    return ConfigDict(
        {
            "network": network, "in_classes": 1, "out_classes": 2,
            "patch_size": (patch,) * 3, "init_lr": 1e-3,
            "init_type": "kaiming", "precision": "bfloat16", "seed": 0,
        }
    )


def bench_train(network="unet", patch=128, n_steps=10, bs=1):
    """patch: int for cubic 3-D patches, or a (D, H, W) tuple — (1, H, W)
    benches the 2-D families through the driver's slice adapter."""
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    shape = (patch,) * 3 if isinstance(patch, int) else tuple(patch)
    config = _config(network, 0)
    config.patch_size = shape
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    gen = jax.jit(lambda k: (
        jax.random.normal(jax.random.fold_in(k, 1), (bs,) + shape + (1,), jnp.float32),
        (jax.random.uniform(jax.random.fold_in(k, 2), (bs,) + shape + (1,)) > 0.5).astype(jnp.float32),
    ))
    x, y = gen(rng)
    for _ in range(3):
        params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
    float(loss)  # hard sync (block_until_ready unreliable on some transports)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
    float(loss)
    return bs * n_steps / (time.perf_counter() - t0)


def bench_inference(network="unet", n_volumes=7, vol_shape=(256, 256, 128), patch=128, batch_size=1, overlap=None):
    # batch_size=1 measured fastest at 128^3 on v5e (larger tiles batches
    # regress XLA layouts; see BASELINE.md r2 notes)
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        sliding_window_predict,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.predict import make_forward_fn
    from general_medical_image_segmentation_cnn_framework_tpu.train import init_train_state

    config = _config(network, patch)
    config.batch_size = batch_size
    model = build_model(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": stats}
    forward = make_forward_fn(config, model)
    vol = np.random.default_rng(0).normal(size=(1,) + tuple(vol_shape)).astype(np.float32)
    if overlap is None:
        overlap = tuple(min(4, patch - 1) for _ in range(2)) + (min(36, patch - 1),)

    # Measure what the CLI predict driver actually does (predict.py):
    # bf16 upload (exact for a bf16-compute model; halves the dominant
    # host->device transfer) AND a prefetch thread that uploads the NEXT
    # volume while the device scans the current one — the upload hides
    # completely behind the scan (BASELINE.md r6 stage profile).
    import queue
    import threading

    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        prepare_volume,
    )

    def run(vol_dev, on_dispatch=None, sync=True):
        return sliding_window_predict(
            forward, variables, vol_dev, (patch,) * 3, overlap,
            batch_size=batch_size, on_dispatch=on_dispatch, sync=sync,
        )

    run(prepare_volume(vol, jnp.bfloat16))  # warm the compiled scan

    # ordered + deferred pipeline, like predict.py: the loader uploads the
    # NEXT volume only after the current scan is DISPATCHED (on_dispatch
    # releases; un-ordered uploads serialize the next dispatch behind
    # ~200 ms of transfer), and each iteration fetches the PREVIOUS
    # volume's mask while the current scan runs (sync=False thunks).
    # Measured ~1.38x over the free-running prefetch (BASELINE.md r6).
    q: queue.Queue = queue.Queue(maxsize=2)
    sem = threading.Semaphore(1)

    def loader():
        for _ in range(n_volumes):
            sem.acquire()
            q.put(prepare_volume(vol, jnp.bfloat16))

    threading.Thread(target=loader, daemon=True).start()
    pending = None
    t0 = time.perf_counter()
    for _ in range(n_volumes):
        thunk = run(q.get(), on_dispatch=sem.release, sync=False)
        if pending is not None:
            pending()
        pending = thunk
    pending()
    total = time.perf_counter() - t0
    return 60.0 / (total / n_volumes)


def bench_whole_volume(network="unet", n_volumes=5, vol_shape=(256, 256, 128)):
    """Single-shot full-volume inference (config.whole_volume): no tiling,
    bf16 transfer."""
    import jax.numpy as jnp

    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        whole_volume_predict,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.predict import make_forward_fn
    from general_medical_image_segmentation_cnn_framework_tpu.train import init_train_state

    config = _config(network, 128)
    model = build_model(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": stats}
    forward = make_forward_fn(config, model)
    vol = np.random.default_rng(0).normal(size=(1,) + tuple(vol_shape)).astype(np.float32)

    # pipelined like the CLI driver: the loader thread uploads the next
    # volume (bf16) while the device runs the current forward — the
    # upload (~205 ms at this shape) dominates the 84 ms whole-volume
    # forward on tunneled transports, so hiding it matters even more
    # here than in the tiled path.
    import queue
    import threading

    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        prepare_volume,
    )

    # loader pads to the registry pad_multiple like predict.py does
    from general_medical_image_segmentation_cnn_framework_tpu.models.registry import (
        pad_multiple,
    )

    pm = pad_multiple(network)
    padded = tuple(-(-s // pm) * pm for s in vol_shape)
    vol_p = np.pad(vol, [(0, 0)] + [(0, p - s) for p, s in zip(padded, vol_shape)])

    def run(vol_dev, on_dispatch=None, sync=True):
        return whole_volume_predict(
            forward, variables, vol_dev, pad_multiple=pm,
            on_dispatch=on_dispatch, sync=sync,
        )

    run(prepare_volume(vol_p, jnp.bfloat16))  # warm

    # ordered + deferred pipeline (see bench_inference / predict.py)
    q: queue.Queue = queue.Queue(maxsize=2)
    sem = threading.Semaphore(1)

    def loader():
        for _ in range(n_volumes):
            sem.acquire()
            q.put(prepare_volume(vol_p, jnp.bfloat16))

    threading.Thread(target=loader, daemon=True).start()
    pending = None
    t0 = time.perf_counter()
    for _ in range(n_volumes):
        thunk = run(q.get(), on_dispatch=sem.release, sync=False)
        if pending is not None:
            pending()
        pending = thunk
    pending()
    total = time.perf_counter() - t0
    return 60.0 / (total / n_volumes)


def bench_whole_volume_train(vol_shape=(256, 256, 128), n_steps=5, remat=False):
    """Whole-volume TRAINING (no patch sampling): one fwd+bwd+Adam step on
    the full volume. Returns 128^3-patch-equivalents/s. remat=False fits
    v5e HBM at this size (measured 305.8 vs 318.0 ms with remat_policy=conv
    vs 359.6 full remat); bench_whole_volume_train_auto retries with
    selective remat if the no-remat step OOMs on a smaller chip."""
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    config = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": 2,
            "patch_size": tuple(vol_shape), "init_lr": 1e-3,
            "init_type": "kaiming", "precision": "bfloat16", "seed": 0,
            "remat": remat, "remat_policy": "conv" if remat else "",
        }
    )
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    gen = jax.jit(lambda k: (
        jax.random.normal(jax.random.fold_in(k, 1), (1,) + tuple(vol_shape) + (1,), jnp.float32),
        (jax.random.uniform(jax.random.fold_in(k, 2), (1,) + tuple(vol_shape) + (1,)) > 0.5).astype(jnp.float32),
    ))
    x, y = gen(rng)
    for _ in range(2):
        params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
    float(loss)
    per_step = (time.perf_counter() - t0) / n_steps
    patch_equiv = float(np.prod(vol_shape)) / float(128**3)
    return patch_equiv / per_step


def bench_epoch_scan(patch=128, vol=160, n_vols=2, samples=10):
    """End-to-end-per-epoch training via the epoch_scan path: device-side
    uniform patch sampling + forward + backward + Adam + metrics for a whole
    epoch in ONE XLA program (the CLI's `epoch_scan=true` + device backend).
    Returns patches/s including the sampling work."""
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.ops.epoch_scan import (
        build_epoch_plan,
        make_epoch_scan,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.ops.fused import (
        fused_bce_dice_metrics,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_forward,
    )

    config = _config("unet", patch)
    config.batch_size = 1
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    gen = jax.jit(lambda k: (
        jax.random.normal(k, (n_vols, vol, vol, vol, 1), jnp.float32),
        (jax.random.uniform(jax.random.fold_in(k, 1), (n_vols, vol, vol, vol, 1)) > 0.5).astype(jnp.float32),
    ))
    volumes_dev, labels_dev = gen(rng)

    forward = make_forward(config, model)

    def loss_and_metric(pred, gt):
        loss, _, dice = fused_bce_dice_metrics(pred, gt)
        return loss, dice

    epoch_fn = make_epoch_scan(config, model, tx, forward, loss_and_metric)
    plan_rng = np.random.default_rng(0)
    vol_idx, origins = build_epoch_plan(
        n_vols, samples, 1, (vol, vol, vol), (patch,) * 3, plan_rng
    )
    n_steps = vol_idx.shape[0]

    def run():
        nonlocal params, stats, opt
        params, stats, opt, losses, dices = epoch_fn(
            params, stats, opt, volumes_dev, labels_dev,
            jnp.asarray(vol_idx), jnp.asarray(origins), rng,
        )
        float(losses[-1])

    run()  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return n_steps / float(np.median(times))


def bench_whole_volume_train_auto():
    """No-remat first (fastest, fits a v5e); on failure (e.g. OOM on a
    smaller chip) retry with selective remat_policy=conv."""
    try:
        return bench_whole_volume_train(remat=False)
    except Exception as e:
        print(
            f"[companion] whole-volume train no-remat failed ({str(e)[:120]}); "
            "retrying with remat_policy=conv",
            file=sys.stderr,
        )
        return bench_whole_volume_train(remat=True)


def _run_ab_script(args, timeout):
    """Run a scripts/ A/B in a SUBPROCESS with a hard timeout and return
    its stdout ('' on timeout/failure). Containment matters: a Mosaic
    compile hang or a wedging transport inside an experiment must cost
    that experiment, never the driver's whole bench (r1/r3 precedents).
    All output is forwarded to stderr for the round log."""
    import os
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    try:
        r = subprocess.run(
            [sys.executable] + args, timeout=timeout, cwd=root,
            capture_output=True, text=True,
        )
        out = r.stdout
        print(f"[extras] {' '.join(args)} rc={r.returncode}\n{out}\n{r.stderr[-2000:]}",
              file=sys.stderr, flush=True)
        return out if r.returncode == 0 else ""
    except subprocess.TimeoutExpired as e:
        out = e.stdout if isinstance(e.stdout, str) else (e.stdout or b"").decode(errors="replace")
        print(f"[extras] {' '.join(args)} TIMEOUT >{timeout}s\n{out}",
              file=sys.stderr, flush=True)
        return ""


def _parse_medians(text, pattern, group_key, group_val):
    """Collect rep lines and reduce to a per-key median."""
    import re
    from collections import defaultdict

    vals = defaultdict(list)
    for m in re.finditer(pattern, text):
        vals[m.group(group_key)].append(float(m.group(group_val)))
    return {k: float(np.median(v)) for k, v in vals.items()}


def _ensure_live_backend(probe_timeout: int = 180) -> str:
    """Guard against a wedged device transport: the tunneled TPU relay can
    hang ``jax.devices()`` forever IN EVERY PROCESS (observed r3). Probe it
    in a subprocess with a timeout; on failure fall back to CPU so the
    round still records an artifact (flagged via the returned platform).
    ``GMIST_PLATFORM`` skips the probe and forces a backend directly."""
    import os

    from general_medical_image_segmentation_cnn_framework_tpu.utils.machine import (
        probe_device_count,
    )

    forced = os.environ.get("GMIST_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
        return forced
    if probe_device_count(timeout=probe_timeout) is not None:
        return jax.default_backend()
    print(
        "[bench] device backend probe failed (wedged transport?); "
        "falling back to CPU", file=sys.stderr,
    )
    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"


def main() -> None:
    platform = _ensure_live_backend()
    # Persistent XLA compile cache (same dir + per-machine CPU salt as the
    # CLI drivers): without it a cold CPU fallback spends its entire budget
    # compiling 3-D convs (the r3 artifact died that way, rc=124).
    from types import SimpleNamespace

    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        enable_compilation_cache,
    )

    enable_compilation_cache(SimpleNamespace())
    n_dev = len(jax.devices())
    cpu_fb = platform.startswith("cpu")
    # CPU fallback: the artifact is flagged via "platform" and is not
    # baseline-comparable, so its one job is to EXIST — shrink shapes and
    # counts until the whole run finishes in ~2 min (VERDICT r3 #2: the r3
    # fallback kept honest 256^3 shapes and timed out at 0.01 patches/s,
    # losing the primary line entirely).
    if cpu_fb:
        vol_shape, patch, ovl = (64, 64, 64), 32, (4, 4, 4)
        vols_per_min = bench_inference(
            n_volumes=2, vol_shape=vol_shape, patch=patch, overlap=ovl
        )
        shape_tag = "x".join(map(str, vol_shape))
    else:
        vol_shape, patch = (256, 256, 128), 128
        vols_per_min = bench_inference(n_volumes=7)
        shape_tag = "256x256x128"

    primary = {
        "metric": f"sliding_window_inference_{shape_tag}_unet3d_chips{n_dev}",
        "value": round(vols_per_min, 2),
        "unit": "vols/min",
        "vs_baseline": round(vols_per_min / 5.0, 4),
        "platform": platform,
    }
    # Emit the primary line the moment it exists: if a driver timeout kills
    # the secondaries below, the last parseable JSON line on stdout is this
    # one and the round still records a valid artifact. The enriched line
    # printed at the end supersedes it (drivers take the LAST JSON line).
    print(json.dumps(primary), flush=True)

    secondary = []
    t_start = time.perf_counter()
    # Soft wall budget for the secondaries: generous on real hardware,
    # tight on the CPU fallback so `timeout 600 python bench.py` always
    # completes rc=0 with the enriched line.
    budget_s = 150.0 if cpu_fb else 1800.0

    def emit():
        # Re-emit the enriched line after every addition: drivers take the
        # LAST parseable JSON line, so a timeout anywhere below loses only
        # the not-yet-measured tail, never the whole artifact.
        primary["secondary"] = secondary
        print(json.dumps(primary), flush=True)

    def record(metric, fn, unit):
        if time.perf_counter() - t_start > budget_s:
            print(f"[companion] {metric} skipped (wall budget)", file=sys.stderr)
            return
        try:
            value = fn()
            secondary.append({"metric": metric, "value": round(value, 2), "unit": unit})
            print(f"[companion] {metric}: {value:.2f} {unit}", file=sys.stderr)
            emit()
        except Exception as e:  # secondary benches are informational
            print(f"[companion] {metric} failed: {str(e)[:200]}", file=sys.stderr)
        finally:
            # Each bench_* builds its own model/state/executables; live
            # jitted programs pin device buffers and by the 8th secondary
            # HBM is exhausted (vtnet whole-volume + unet2d-512 both hit
            # RESOURCE_EXHAUSTED in one r7 run). In-process jit reuse
            # between DIFFERENT secondaries is ~zero (different models and
            # shapes) and the on-disk XLA cache keeps recompiles cheap, so
            # dropping caches between benches costs little and frees HBM.
            import gc

            gc.collect()
            jax.clear_caches()

    if cpu_fb:
        record(
            f"unet3d_32_train_chips{n_dev}",
            lambda: bench_train("unet", patch=32, n_steps=2),
            "patches/s",
        )
        record(
            f"unet2d_128_train_chips{n_dev}",
            lambda: bench_train("unet2d", patch=(1, 128, 128), bs=2, n_steps=2),
            "slices/s",
        )
    else:
        record(
            f"unet3d_whole_volume_256x256x128_chips{n_dev}",
            lambda: bench_whole_volume("unet", n_volumes=5),
            "vols/min",
        )
        record(
            f"unet3d_128_train_chips{n_dev}",
            lambda: bench_train("unet", n_steps=10),
            "patches/s",
        )
        record(
            f"unet3d_whole_volume_train_256x256x128_chips{n_dev}",
            bench_whole_volume_train_auto,
            "patch_equiv/s",
        )
        record(
            f"unet3d_128_train_epoch_scan_e2e_chips{n_dev}",
            bench_epoch_scan,
            "patches/s",
        )
        record(
            f"unetr_128_train_chips{n_dev}",
            lambda: bench_train("unetr", n_steps=5),
            "patches/s",
        )
        record(
            f"vtunet_128_train_chips{n_dev}",
            lambda: bench_train("vtnet", n_steps=5),
            "patches/s",
        )
        record(
            f"vtunet_inference_256x256x128_chips{n_dev}",
            lambda: bench_inference("vtnet", n_volumes=2, batch_size=1),
            "vols/min",
        )
        record(
            f"vtunet_whole_volume_256x256x128_chips{n_dev}",
            lambda: bench_whole_volume("vtnet", n_volumes=3),
            "vols/min",
        )
        record(
            f"unet2d_512_train_chips{n_dev}",
            lambda: bench_train("unet2d", patch=(1, 512, 512), bs=8, n_steps=10),
            "slices/s",
        )

        # --- queued hardware A/Bs (VERDICT r3 #1), subprocess-contained ---
        # Each runs scripts/<ab>.py in its own process with a hard timeout:
        # both sides of every pair are measured interleaved in ONE process
        # (tunnel variance is +-40%; only paired comparisons are valid),
        # and a Mosaic hang or wedge costs one experiment, not the bench.
        extras_deadline = time.perf_counter() + float(
            __import__("os").environ.get("GMIST_BENCH_EXTRAS_S", "3600")
        )

        def extra(args, timeout, parse):
            left = extras_deadline - time.perf_counter()
            if left < 120:
                print(f"[extras] {args[0]} skipped (wall budget)", file=sys.stderr)
                return
            out = _run_ab_script(args, timeout=min(timeout, left))
            if out:
                # extras must NEVER fail the bench: the primary metric is
                # already emitted, and a parse bug (r6: missing re import)
                # would turn a successful hardware run into rc!=0
                try:
                    for metric, value, unit in parse(out):
                        secondary.append(
                            {"metric": metric, "value": round(value, 2), "unit": unit}
                        )
                except Exception as exc:  # noqa: BLE001
                    print(f"[extras] {args[0]} parse failed: {exc}", file=sys.stderr)
                emit()

        def parse_tlayout(out):
            import re

            for m in re.finditer(
                r"(\w+)_(\d+) step: off=([\d.]+)ms v1=([\d.]+)ms v2=([\d.]+)ms",
                out,
            ):
                net, patch_s = m.group(1), m.group(2)
                for i, var in enumerate(("off", "v1", "v2")):
                    yield (
                        f"{net}_{patch_s}_train_step_tlayout_{var}",
                        float(m.group(3 + i)),
                        "ms",
                    )
            for m in re.finditer(
                r"(\w+)_whole_volume infer: off=([\d.]+)vols/min "
                r"v1=([\d.]+)vols/min v2=([\d.]+)vols/min",
                out,
            ):
                for i, var in enumerate(("off", "v1", "v2")):
                    yield (
                        f"{m.group(1)}_whole_volume_infer_tlayout_{var}",
                        float(m.group(2 + i)),
                        "vols/min",
                    )

        def parse_device_aug(out):
            med = _parse_medians(
                out, r"aug=true (?:\d+)\^3 (\w+)-backend rep\d+: ([\d.]+) patches/s",
                1, 2,
            )
            for backend, v in med.items():
                yield f"unet3d_128_train_aug_{backend}_backend", v, "patches/s"

        def parse_harness(out):
            med = _parse_medians(
                out, r"(?:\w+) (?:\d+)\^3 (\w+) rep\d+: ([\d.]+) ms/step", 1, 2
            )
            for variant, v in med.items():
                yield variant, v, "ms/step"  # caller wraps the name

        def wrap(prefix, gen):
            return lambda out: (
                (f"{prefix}_{m}", v, u) for m, v, u in gen(out)
            )

        # r5: the r4 extras' decisions are made and recorded in BASELINE.md
        # (device aug 2.6x -> promoted to default; phased transpose 21.6x
        # and dilated tap-group 2.9x -> confirmed defaults; tlayout
        # in-step LOSES on this transport -> stays opt-in), so the
        # round-end bench no longer re-runs them — the budget goes to two
        # cheap regression canaries for this round's fixes instead.
        _ = (parse_tlayout, parse_device_aug, wrap, parse_harness)  # manual reuse
        extra(
            ["scripts/bench_zoo.py", "--patch", "64", "--reps", "5",
             "--nets", "fcn3d,densenet"],
            1500,
            lambda out: (
                (f"{m.group(1)}_64_train_step", float(m.group(2)), "ms/step")
                for m in re.finditer(r"(\w+)\s+3d\s+([\d.]+) ms/step", out)
            ),
        )

    emit()


if __name__ == "__main__":
    main()
