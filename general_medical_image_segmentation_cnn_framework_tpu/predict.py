"""Prediction driver: sliding-window whole-volume inference.

Behavioral parity with /root/reference/predict.py:62-214 — per volume:
ZNormalization -> grid tiling with patch_overlap (4,4,36 by default) ->
model forward -> argmax -> crop-mode overlap aggregation -> mask written as
``pred_file/pred-%04d{.nii.gz|.mhd}`` with the original affine -> per-volume
(precision, recall, jaccard, dice, hd95) -> metrics.csv with a mean row.

TPU-first: the whole volume lives on device; tiles are gathered with a
vmapped dynamic_slice and run as fixed-shape batches (one compile per
volume shape) instead of the reference's per-patch host loop with a D2H
copy per patch (predict.py:141-142).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import load_any_checkpoint
from .data.io import Volume, write_volume
from .data.pipeline import get_subjects, load_subject
from .data.transforms import ZNormalization
from .logging_utils import ProgressBars, get_logger, log_config
from .metrics import multiclass_seg_metrics, seg_metrics
from .models import build_model
from .ops.fft import band_split
from .ops.sliding_window import sliding_window_predict
from .train import init_train_state


def make_forward_fn(config, model):
    """Jittable ``(variables, tiles) -> logits`` with IS band-split handling
    (reference predict.py:128-133). Variables are an argument, not a
    closure, so the compiled program doesn't embed the weights as
    constants (see ops/sliding_window.py). ``config.tta`` wraps the
    forward in flip-averaged test-time augmentation (see ``wrap_tta``)."""
    from .models.registry import is_2d

    if is_2d(config.network):

        def forward(variables, tiles):
            out = model.apply(variables, tiles[:, 0], train=False)
            if isinstance(out, tuple):
                out = out[0]
            return out[:, None]

    elif config.network == "IS":

        def forward(variables, tiles):
            low, high = band_split(tiles, limit=0.04)
            pred, _ = model.apply(variables, tiles, low, high, train=False)
            return pred

    else:

        def forward(variables, tiles):
            out = model.apply(variables, tiles, train=False)
            return out[0] if isinstance(out, tuple) else out

    return wrap_tta(config, forward)


def wrap_tta(config, forward):
    """Flip-averaged test-time augmentation (``config.tta``; no reference
    equivalent — the reference predicts each tile once, predict.py:128-133).

    ``tta='flips'`` averages the logits over every combination of spatial
    mirror flips (8 forwards for 3-D nets, 4 for 2-D); ``tta='flips:hw'``
    restricts to a named subset of axes (d/h/w). All flips are traced into
    the ONE jitted scan program — the tiles never leave the device, the
    extra forwards batch straight onto the MXU, and the averaged logits
    flow into the unchanged crop/mean-logits aggregation (so device-side
    masking, bit-packing and blending all compose)."""
    import itertools

    from .models.registry import is_2d

    spec = str(getattr(config, "tta", "") or "")
    if not spec:
        return forward
    two_d = is_2d(config.network)
    # axis indices over the tile layout [B, D, H, W, C]
    names = {"d": 1, "h": 2, "w": 3}
    if spec == "flips":
        axes = (2, 3) if two_d else (1, 2, 3)
    elif spec.startswith("flips:"):
        sel = spec.split(":", 1)[1]
        bad = [c for c in sel if c not in names]
        if bad or not sel:
            raise KeyError(f"tta='{spec}': axes must be a subset of 'dhw'")
        axes = tuple(names[c] for c in sel)
        if two_d and 1 in axes:
            raise KeyError(
                f"tta='{spec}': 2-D network '{config.network}' has no depth "
                "axis to flip (use flips:hw)"
            )
    else:
        raise KeyError(f"unknown tta '{spec}' ('' | flips | flips:<dhw subset>)")
    combos = [
        c for r in range(len(axes) + 1) for c in itertools.combinations(axes, r)
    ]

    def tta_forward(variables, tiles):
        # One lax.scan over the stacked flip variants: the model forward is
        # traced ONCE, not len(combos) times — an unrolled 8x program blew
        # past the tunnel's remote-compile budget (BASELINE r8) while this
        # form compiles like the plain forward. The un-flip is a vectorized
        # take_along_axis per axis (reversal == gather with reversed
        # indices), bit-identical to flipping each output individually.
        stack = jnp.stack(
            [jnp.flip(tiles, c) if c else tiles for c in combos]
        )

        def body(_, xt):
            return None, forward(variables, xt)

        _, ys = jax.lax.scan(body, None, stack)  # [V, B, ..., n_classes]
        for ax in axes:  # tile axis ax -> ys axis ax+1 (variant dim in front)
            out_ax = ax + 1
            n = ys.shape[out_ax]
            rev = jnp.arange(n - 1, -1, -1)
            fwd_idx = jnp.arange(n)
            sel = jnp.asarray([ax in c for c in combos])
            idx = jnp.where(sel[:, None], rev[None, :], fwd_idx[None, :])
            shape = [len(combos)] + [1] * (ys.ndim - 1)
            shape[out_ax] = n
            ys = jnp.take_along_axis(ys, idx.reshape(shape), axis=out_ax)
        return jnp.mean(ys, axis=0)

    return tta_forward


def predict(model=None, config=None, logger=None):
    assert config is not None
    if model is None:
        model = build_model(config)
    if logger is None:
        logger = get_logger(config)
    from .train import apply_platform, enable_compilation_cache

    apply_platform(config)

    enable_compilation_cache(config)

    # restore weights (reference predict.py:79-81: consumes ckpt["model"])
    rng = jax.random.PRNGKey(0)
    params, batch_stats, _, _ = init_train_state(config, model, rng)
    try:
        state = load_any_checkpoint(
            config.ckpt, {"params": params, "batch_stats": batch_stats, "epoch": 0}
        )
    except (KeyError, ValueError) as e:
        raise ValueError(
            f"checkpoint {config.ckpt!r} does not match network "
            f"'{config.network}' (trained with a different architecture or "
            f"settings?): {e}"
        ) from e
    variables = {"params": state["params"], "batch_stats": state["batch_stats"]}

    pairs = get_subjects(config)
    logger.info(f"predicting {len(pairs)} volumes")
    forward = make_forward_fn(config, model)

    overlap = config.patch_overlap
    if isinstance(overlap, str):
        overlap = tuple(int(v) for v in overlap.split(","))
    elif isinstance(overlap, int):
        overlap = (overlap,) * 3
    # overlap must stay below the patch extent (e.g. depth-1 slabs for 2-D)
    overlap = tuple(min(o, p - 1) for o, p in zip(overlap, config.patch_size))

    # multi-chip serving: shard the tile batch over the mesh's data axis —
    # or, in whole-volume mode, shard the volume spatially over EVERY
    # device (spatial partitioning is independent of batch size)
    from .models.registry import is_2d

    whole_volume = bool(getattr(config, "whole_volume", False))
    if whole_volume and is_2d(config.network):
        logger.warning(
            f"whole_volume is 3-D only; '{config.network}' is a 2-D "
            "network — falling back to sliding-window prediction"
        )
        whole_volume = False
    mesh = None
    if len(jax.devices()) > 1:
        if whole_volume:
            from .parallel.mesh import make_mesh

            mesh = make_mesh("data=-1")
            logger.info(
                f"whole volume spatially sharded over {mesh.shape['data']} devices"
            )
        else:
            from .parallel.mesh import make_data_mesh

            mesh = make_data_mesh(
                getattr(config, "mesh_shape", "data=-1"), int(config.batch_size)
            )
            if mesh.shape.get("data", 1) <= 1:
                mesh = None
            else:
                logger.info(
                    f"inference tiles sharded over {mesh.shape['data']} devices"
                )

    znorm = ZNormalization()
    progress = ProgressBars()
    file_task = progress.add_task("[red]file", total=len(pairs))

    # Pipelined predict: a loader thread prefetches + z-normalizes the next
    # volume while the device runs the current one, and mask writing + the
    # (scipy EDT, host-side) HD95 metric run on worker threads — the TPU
    # never idles on host I/O (the reference loop is fully serial,
    # /root/reference/predict.py:90-184).
    import queue as queue_mod
    import threading
    from concurrent.futures import ThreadPoolExecutor

    load_q: queue_mod.Queue = queue_mod.Queue(maxsize=2)
    stop = threading.Event()
    # Upload ordering: the loader may only start a bulk host->device
    # transfer once the CURRENT volume's scan program has been DISPATCHED
    # (on_dispatch below releases). An upload that lands on the wire
    # between mask-fetch and the next dispatch serializes the dispatch
    # behind ~200 ms of transfer on single-connection transports
    # (measured, BASELINE.md r6) — ordered, it hides behind the running
    # scan completely. Initial value 1: the first volume uploads with
    # nothing in flight.
    upload_sem = threading.Semaphore(1)

    def _acquire_upload() -> bool:
        while not stop.is_set():
            if upload_sem.acquire(timeout=0.5):
                return True
        return False

    def _put(item):
        # stop-aware put: never block forever if the consumer already exited
        # (stop.set() in the outer finally) while the queue is full.
        while not stop.is_set():
            try:
                load_q.put(item, timeout=0.5)
                return
            except queue_mod.Full:
                continue

    # shape bucketing (opt-in): round spatial dims up to a multiple so
    # heterogeneous volumes share ONE compiled program (each new volume
    # shape otherwise recompiles the whole scan — minutes on remote-compile
    # transports). The tile grid / crop rules follow the TRUE extent, so
    # bucketed sliding-window predictions are byte-identical to unbucketed.
    # NOTE whole_volume + bucket is NOT byte-identical to unbucketed
    # whole-volume: the whole volume is padded to lcm(pad_multiple, bucket)
    # BEFORE the single forward, so voxels near the true border see extra
    # zero-pad context inside their receptive field (vs padding only to
    # pad_multiple). Both are valid conv paddings of the same volume —
    # pinned by tests/test_whole_volume_bucket.py.
    bucket = int(getattr(config, "shape_bucket", 0) or 0)

    import jax.numpy as jnp

    from .ops.sliding_window import prepare_volume

    # bf16 upload halves the host->device transfer and is EXACT for a
    # bf16-compute model — the first conv casts the input anyway.
    in_dtype = (
        jnp.bfloat16
        if getattr(config, "precision", "") == "bfloat16"
        else None
    )
    if whole_volume:
        import math

        from .models.registry import pad_multiple as _registry_pad

        pm = _registry_pad(config.network)
        wv_pad = math.lcm(pm, bucket) if bucket else pm
    else:
        wv_pad = None

    def _loader():
        try:
            for i, pair in enumerate(pairs):
                if stop.is_set():
                    return
                subject = load_subject(pair)
                src = znorm.normalize_array(subject.source.data)
                orig_shape = src.shape[1:]
                pad_to = wv_pad if whole_volume else bucket
                if pad_to:
                    padded = tuple(
                        -(-s // pad_to) * pad_to for s in orig_shape
                    )
                    pads = [(0, 0)] + [
                        (0, p - s) for p, s in zip(padded, orig_shape)
                    ]
                    src = np.pad(src, pads)
                # the host->device transfer runs HERE on the loader thread,
                # overlapping the PREVIOUS volume's device scan — measured
                # to hide completely on the tunneled transport (upload
                # ~205 ms bf16 vs scan ~220 ms at 256x256x128, BASELINE r6)
                # — but only once that scan is dispatched (see upload_sem).
                if not _acquire_upload():
                    return
                vol_dev = prepare_volume(src, in_dtype)
                _put((i, subject, orig_shape, vol_dev))
        except BaseException as exc:
            _put(exc)
        finally:
            _put(None)

    threading.Thread(target=_loader, daemon=True).start()

    def _finish(i, pred_t, gt_t, affine, spacing):
        save_pred(pred_t, affine, i, config)
        if int(config.out_classes) > 2:
            return multiclass_seg_metrics(
                gt_t, pred_t, int(config.out_classes), spacing
            )
        return seg_metrics(gt_t, pred_t, spacing)

    results = [None] * len(pairs)
    try:
        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = {}

            def _drain(pend):
                # fetch volume i-1's mask while volume i's scan runs on
                # device (software pipelining: the fetch waits on a scan
                # that has already had a full pipeline period to finish)
                i, thunk, orig_shape, subject = pend
                pred_t = thunk()
                if whole_volume:
                    pred_t = pred_t[
                        :, : orig_shape[0], : orig_shape[1], : orig_shape[2]
                    ]
                futures[i] = pool.submit(
                    _finish, i, pred_t, subject.gt.data,
                    subject.source.affine, subject.source.spacing,
                )
                progress.update(file_task, completed=i + 1)

            pending = None
            while True:
                item = load_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                i, subject, orig_shape, src_dev = item
                if whole_volume:
                    from .ops.sliding_window import whole_volume_predict

                    thunk = whole_volume_predict(
                        forward, variables, src_dev, mesh=mesh,
                        pad_multiple=wv_pad,
                        on_dispatch=upload_sem.release,
                        sync=False,
                    )
                else:
                    thunk = sliding_window_predict(
                        forward,
                        variables,
                        src_dev,
                        config.patch_size,
                        overlap,
                        batch_size=int(config.batch_size),
                        overlap_mode=getattr(config, "blend", "crop") or "crop",
                        mesh=mesh,
                        true_spatial=orig_shape if bucket else None,
                        on_dispatch=upload_sem.release,
                        sync=False,
                    )
                if pending is not None:
                    _drain(pending)
                pending = (i, thunk, orig_shape, subject)
            if pending is not None:
                _drain(pending)
            for i, fut in futures.items():
                results[i] = fut.result()
    finally:
        stop.set()  # unblock the loader if we exited early

    pre_ls, rec_ls, jac_ls, dice_ls, hs95_ls = [], [], [], [], []
    for i, (precision, recall, jaccard, dice, hs95) in enumerate(results):
        pre_ls.append(precision)
        rec_ls.append(recall)
        jac_ls.append(jaccard)
        dice_ls.append(dice)
        hs95_ls.append(hs95)
        logger.info(
            f"File {i + 1} metrics: "
            f"\nprecision: {precision}\nrecall: {recall}"
            f"\njaccard: {jaccard}\ndice: {dice}\nhs95: {hs95}"
        )

    progress.stop()
    save_csv(pre_ls, rec_ls, jac_ls, dice_ls, hs95_ls, config)
    logger.info(
        f"\nprecision_mean: {np.mean(pre_ls)}\nrecall_mean: {np.mean(rec_ls)}"
        f"\njaccard_mean: {np.mean(jac_ls)}\ndice_mean: {np.mean(dice_ls)}"
        f"\nhs95_mean: {_finite_mean(hs95_ls)}"
    )
    return {
        "precision": pre_ls,
        "recall": rec_ls,
        "jaccard": jac_ls,
        "dice": dice_ls,
        "hs95": hs95_ls,
    }


def save_pred(pred: np.ndarray, affine: np.ndarray, index: int, config) -> None:
    """pred_file/pred-%04d with the configured suffix (reference
    predict.py:204-214; save_suffix from conf/config/unet.yaml:5)."""
    save_base = Path(config.hydra_path) / "pred_file"
    save_base.mkdir(parents=True, exist_ok=True)
    suffix = getattr(config, "save_suffix", ".nii.gz") or ".nii.gz"
    vol = Volume(pred.astype(np.float32), affine)
    write_volume(save_base / f"pred-{index:04d}{suffix}", vol)


def _finite_mean(values) -> float:
    """Mean over finite entries only. hausdorff_95 is inf when either mask
    has no surface (the reference's MONAI path yields nan there); one such
    volume must not turn the whole run's mean row into inf/nan."""
    arr = np.asarray(values, dtype=np.float64)
    finite = arr[np.isfinite(arr)]
    return float(finite.mean()) if finite.size else float("nan")


def save_csv(pre_ls, rec_ls, jac_ls, dice_ls, hs95_ls, config) -> None:
    """metrics.csv: 5 metric columns + appended mean row
    (reference predict.py:186-201). The mean row skips non-finite values."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "precision": pre_ls,
            "recall": rec_ls,
            "jaccard": jac_ls,
            "dice": dice_ls,
            "hs95": hs95_ls,
        }
    )
    df.loc[len(df)] = [_finite_mean(df.iloc[:, c]) for c in range(5)]
    df.to_csv(os.path.join(config.hydra_path, "metrics.csv"), index=False)


def main(argv: Optional[list] = None) -> None:
    """CLI: ``python predict.py config=unet config.ckpt=<path>``."""
    import sys

    from .config import compose

    overrides = argv if argv is not None else sys.argv[1:]
    config = compose(overrides, job_name="predict")
    assert config.ckpt, "config.ckpt is required for predict"
    model = build_model(config)
    logger = get_logger(config)
    log_config(logger, config)
    predict(model, config, logger)
