"""Resident serving: a reusable ``Predictor`` engine, a directory-watch
server, and AOT program export.

The reference has no serving story at all — its predict driver
(/root/reference/predict.py:56-184) rebuilds the model, reloads the
checkpoint, and re-enters torch per invocation.  For production TPU
serving the expensive parts are one-time (model build, checkpoint load,
XLA compile), so this module keeps them resident:

* ``Predictor``   — builds the model/forward/mesh ONCE, then serves any
  number of volumes through the same pipelined device programs the batch
  CLI uses (``ops/sliding_window.py``); per-volume cost is pure
  upload+scan.  ``sync=False`` returns a fetch thunk so callers can
  software-pipeline exactly like the batch driver.
* ``serve``       — a directory-watch loop: new volumes appearing in
  ``config.watch_dir`` are predicted and written to ``<out>/pred_file``
  as they arrive (``python serve.py config=unet config.ckpt=...
  config.watch_dir=/incoming``).
* ``export_predictor`` / ``load_exported_predictor`` — serialize the
  traced predict program (StableHLO via ``jax.export``) to a deployable
  artifact that replays without the model-building Python; the inverse of
  torchscript/ONNX export, which the reference also lacks.

Precision/bucketing/whole-volume semantics match the batch driver
byte-for-byte (same entry points in ops/sliding_window.py).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _parse_overlap(config) -> tuple:
    """Reference overlap semantics (predict driver): int or 'x, y, z',
    clamped below the patch extent; default half-patch when unset."""
    overlap = getattr(config, "patch_overlap", None)
    if overlap is None:
        overlap = tuple(int(p) // 2 for p in config.patch_size)
    if isinstance(overlap, str):
        overlap = tuple(int(v) for v in overlap.split(","))
    elif isinstance(overlap, int):
        overlap = (overlap,) * 3
    return tuple(min(int(o), int(p) - 1) for o, p in zip(overlap, config.patch_size))


class Predictor:
    """One-time setup (model, checkpoint, forward, mesh), many predicts.

    Parameters
    ----------
    config     composed run config (needs ``network``/``patch_size``/...;
               ``ckpt`` unless ``variables`` is given).
    variables  optional ``{"params": ..., "batch_stats": ...}`` pytree —
               skips checkpoint loading (tests, in-process handoff from a
               trainer).
    """

    def __init__(self, config, model=None, variables=None, logger=None):
        from .models import build_model
        from .models.registry import is_2d, pad_multiple
        from .predict import make_forward_fn
        from .train import apply_platform, enable_compilation_cache

        apply_platform(config)
        enable_compilation_cache(config)
        self.config = config
        self.model = model if model is not None else build_model(config)
        self.logger = logger

        if variables is None:
            from .checkpoint import load_any_checkpoint
            from .train import init_train_state

            params, batch_stats, _, _ = init_train_state(
                config, self.model, jax.random.PRNGKey(0)
            )
            try:
                state = load_any_checkpoint(
                    config.ckpt,
                    {"params": params, "batch_stats": batch_stats, "epoch": 0},
                )
            except (KeyError, ValueError) as e:
                raise ValueError(
                    f"checkpoint {config.ckpt!r} does not match network "
                    f"'{config.network}': {e}"
                ) from e
            variables = {
                "params": state["params"],
                "batch_stats": state["batch_stats"],
            }
        self.variables = variables
        self.forward = make_forward_fn(config, self.model)

        self.overlap = _parse_overlap(config)
        self.whole_volume = bool(getattr(config, "whole_volume", False))
        if self.whole_volume and is_2d(config.network):
            self.whole_volume = False  # whole-volume is 3-D only
        self.bucket = int(getattr(config, "shape_bucket", 0) or 0)
        self.in_dtype = (
            jnp.bfloat16
            if getattr(config, "precision", "") == "bfloat16"
            else None
        )
        if self.whole_volume:
            import math

            pm = pad_multiple(config.network)
            self.wv_pad = math.lcm(pm, self.bucket) if self.bucket else pm
        else:
            self.wv_pad = None

        # mesh selection mirrors the batch driver (predict.py): tile-batch
        # data parallelism for the sliding window, spatial sharding for
        # whole-volume
        self.mesh = None
        if len(jax.devices()) > 1:
            if self.whole_volume:
                from .parallel.mesh import make_mesh

                self.mesh = make_mesh("data=-1")
            else:
                from .parallel.mesh import make_data_mesh

                mesh = make_data_mesh(
                    getattr(config, "mesh_shape", "data=-1"),
                    int(config.batch_size),
                )
                self.mesh = mesh if mesh.shape.get("data", 1) > 1 else None

        from .data.transforms import ZNormalization

        self._znorm = ZNormalization()

    # -- volume preparation ------------------------------------------------

    def prepare(self, src: np.ndarray):
        """Normalize + pad a raw [C, X, Y, Z] volume and upload it.

        Returns ``(vol_dev, orig_shape)``; safe to call from a prefetch
        thread (the upload happens here, off the dispatch path)."""
        src = self._znorm.normalize_array(np.asarray(src, np.float32))
        orig_shape = src.shape[1:]
        pad_to = self.wv_pad if self.whole_volume else self.bucket
        if pad_to:
            padded = tuple(-(-s // pad_to) * pad_to for s in orig_shape)
            pads = [(0, 0)] + [(0, p - s) for p, s in zip(padded, orig_shape)]
            src = np.pad(src, pads)
        from .ops.sliding_window import prepare_volume

        return prepare_volume(src, self.in_dtype), orig_shape

    # -- prediction ---------------------------------------------------------

    def predict_array(
        self,
        src: np.ndarray,
        sync: bool = True,
        on_dispatch: Optional[Callable] = None,
    ):
        """Predict a raw (unnormalized) [C, X, Y, Z] volume.

        Returns the [1, X, Y, Z] int mask, or a fetch thunk when
        ``sync=False`` (dispatches now, materializes when called — the
        caller can pipeline uploads/writes around it)."""
        vol_dev, orig_shape = self.prepare(src)
        return self.predict_prepared(
            vol_dev, orig_shape, sync=sync, on_dispatch=on_dispatch
        )

    def predict_prepared(
        self,
        vol_dev,
        orig_shape,
        sync: bool = True,
        on_dispatch: Optional[Callable] = None,
    ):
        """Predict a device volume from :meth:`prepare` (prefetch path)."""
        config = self.config
        if self.whole_volume:
            from .ops.sliding_window import whole_volume_predict

            thunk = whole_volume_predict(
                self.forward, self.variables, vol_dev, mesh=self.mesh,
                pad_multiple=self.wv_pad, on_dispatch=on_dispatch,
                sync=False,
            )

            def _fetch(th=thunk, os_=orig_shape):
                return th()[:, : os_[0], : os_[1], : os_[2]]

        else:
            from .ops.sliding_window import sliding_window_predict

            _fetch = sliding_window_predict(
                self.forward, self.variables, vol_dev,
                config.patch_size, self.overlap,
                batch_size=int(config.batch_size),
                overlap_mode=getattr(config, "blend", "crop") or "crop",
                mesh=self.mesh,
                true_spatial=orig_shape if self.bucket else None,
                on_dispatch=on_dispatch, sync=False,
            )
        return _fetch() if sync else _fetch

    def predict_file(self, in_path, out_path=None) -> np.ndarray:
        """Read a volume file, predict, optionally write the mask."""
        from .data.io import Volume, read_volume, write_volume

        vol = read_volume(in_path)
        mask = self.predict_array(vol.data)
        if out_path is not None:
            write_volume(
                Path(out_path), Volume(mask.astype(np.float32), vol.affine)
            )
        return mask

    def warmup(self, spatial=(128, 128, 128)) -> None:
        """Compile the predict program for one spatial shape up front."""
        self.predict_array(np.zeros((1, *spatial), np.float32))


# -- directory-watch server ----------------------------------------------

_VOLUME_SUFFIXES = (".nii", ".nii.gz", ".mhd")


def _list_volumes(watch_dir: Path):
    files = []
    for p in sorted(watch_dir.iterdir()) if watch_dir.is_dir() else []:
        name = p.name.lower()
        if any(name.endswith(s) for s in _VOLUME_SUFFIXES):
            files.append(p)
    return files


def serve(config, logger=None, once: bool = False, poll_s: float = 2.0):
    """Watch ``config.watch_dir`` and predict volumes as they appear.

    Masks go to ``<config.hydra_path>/pred_file/pred-<name>``.  A file is
    only picked up once its size is stable across two polls (half-written
    uploads are skipped until complete).  ``once=True`` processes what is
    currently there and returns (tests; cron-style batch mode).
    Returns ``{input_name: mask_path}``.
    """
    watch_dir = Path(getattr(config, "watch_dir", "") or "")
    assert str(watch_dir), "config.watch_dir is required for serve"
    out_dir = Path(config.hydra_path) / "pred_file"
    out_dir.mkdir(parents=True, exist_ok=True)

    predictor = Predictor(config, logger=logger)
    if logger:
        logger.info(f"serving {watch_dir} -> {out_dir}")

    suffix = getattr(config, "save_suffix", ".nii.gz") or ".nii.gz"
    done: dict = {}
    sizes: dict = {}
    while True:
        progressed = False
        for p in _list_volumes(watch_dir):
            if p.name in done:
                continue
            size = p.stat().st_size
            if not once and sizes.get(p.name) != size:
                sizes[p.name] = size  # wait one poll for the size to settle
                continue
            stem = p.name
            for s in _VOLUME_SUFFIXES:
                if stem.lower().endswith(s):
                    stem = stem[: len(stem) - len(s)]
                    break
            out_path = out_dir / f"pred-{stem}{suffix}"
            if out_path.exists():
                # idempotent restart: a mask from a previous serve process
                # counts as done (not re-predicted, not in the return dict)
                done.setdefault(p.name, None)
                continue
            t0 = time.perf_counter()
            predictor.predict_file(p, out_path)
            dt = time.perf_counter() - t0
            done[p.name] = str(out_path)
            progressed = True
            if logger:
                logger.info(f"{p.name} -> {out_path.name} ({dt * 1e3:.0f} ms)")
        if once:
            # only volumes predicted by THIS invocation (None = skipped,
            # output already existed)
            return {k: v for k, v in done.items() if v is not None}
        if not progressed:
            time.sleep(poll_s)


# -- AOT export ------------------------------------------------------------


def export_predictor(
    predictor: Predictor, spatial, path=None, batch_size: Optional[int] = None
) -> bytes:
    """Serialize the predict program for one volume shape via ``jax.export``.

    The artifact captures the traced StableHLO of the SAME device program
    the Predictor runs (whole-volume forward+argmax, or the sliding-window
    crop-aggregation scan) with the variables as a runtime argument — it
    replays on any machine with jax installed, no model code needed.
    Binary masks keep the bit-packed device->host layout; use
    ``load_exported_predictor`` to get a host-side callable that unpacks.
    """
    from .ops.sliding_window import (
        _binary_channels,
        _predict_volume_crop,
        _whole_volume_jit,
        grid_locations,
    )

    config = predictor.config
    spatial = tuple(int(s) for s in spatial)
    in_dtype = predictor.in_dtype or jnp.float32

    if predictor.whole_volume:
        pad = predictor.wv_pad
        padded = tuple(-(-s // pad) * pad for s in spatial)
        vol_shape = (1, *padded, int(config.in_classes))
        pack = padded[-1] % 8 == 0 and _binary_channels(
            predictor.forward, predictor.variables, vol_shape, in_dtype
        )

        def fn(variables, x):
            return _whole_volume_jit(
                predictor.forward, variables, x, None, pack=pack
            )

        args = (jax.ShapeDtypeStruct(vol_shape, in_dtype),)
    else:
        patch = tuple(int(p) for p in config.patch_size)
        overlap = predictor.overlap
        bs = int(batch_size or config.batch_size)
        locations = grid_locations(spatial, patch, overlap)
        starts = locations[:, :3].astype(np.int32)
        n = len(starts)
        pad_n = (-n) % bs
        if pad_n:  # replicate the last start so chunks divide evenly
            starts = np.concatenate([starts, np.repeat(starts[-1:], pad_n, 0)])
        vol_shape = (*spatial, int(config.in_classes))
        pack = spatial[-1] % 8 == 0 and _binary_channels(
            predictor.forward, predictor.variables,
            (1, *patch, vol_shape[-1]), in_dtype,
        )

        def fn(variables, x, starts_dev):
            return _predict_volume_crop(
                predictor.forward, variables, x, starts_dev, patch, bs,
                overlap, None, spatial, pack,
            )

        args = (
            jax.ShapeDtypeStruct(vol_shape, in_dtype),
            jax.ShapeDtypeStruct(starts.shape, jnp.int32),
        )

    var_shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), predictor.variables
    )
    exported = jax.export.export(jax.jit(fn))(var_shapes, *args)
    payload = exported.serialize()
    meta = {
        "whole_volume": predictor.whole_volume,
        "spatial": spatial,
        "pack": bool(pack),
        "in_dtype": jnp.dtype(in_dtype).name,
    }
    if predictor.whole_volume:
        meta["padded"] = list(padded)
    else:
        meta["starts"] = starts.tolist()
    blob = _pack_artifact(payload, meta)
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def _pack_artifact(payload: bytes, meta: dict) -> bytes:
    import json

    head = json.dumps(meta).encode()
    return len(head).to_bytes(8, "little") + head + payload


def _unpack_artifact(blob: bytes):
    import json

    n = int.from_bytes(blob[:8], "little")
    meta = json.loads(blob[8 : 8 + n].decode())
    return blob[8 + n :], meta


def load_exported_predictor(source) -> Callable:
    """Load an :func:`export_predictor` artifact (path or bytes).

    Returns ``predict(variables, volume[C, X, Y, Z] raw-normalized) ->
    [1, X, Y, Z] int32 mask`` — the deserialized StableHLO compiled for
    the local backend; no model-building code runs."""
    from .ops.sliding_window import _unpack_bits

    blob = Path(source).read_bytes() if not isinstance(source, bytes) else source
    payload, meta = _unpack_artifact(blob)
    exported = jax.export.deserialize(payload)
    call = jax.jit(exported.call)
    spatial = tuple(meta["spatial"])
    dtype = jnp.dtype(meta["in_dtype"])
    starts = (
        jnp.asarray(np.asarray(meta["starts"], np.int32))
        if "starts" in meta
        else None
    )

    def predict(variables, volume: np.ndarray) -> np.ndarray:
        x = np.moveaxis(np.asarray(volume), 0, -1)  # [X, Y, Z, C]
        if meta["whole_volume"]:
            # zero-pad up to the exported (padded) shape
            target = tuple(meta["padded"])
            pads = [(0, t - s) for t, s in zip(target, x.shape[:-1])] + [(0, 0)]
            x = np.pad(x, pads)[None]
            mask = np.asarray(call(variables, jnp.asarray(x.astype(dtype))))
            if meta["pack"]:
                mask = _unpack_bits(mask)
            return mask[:, : spatial[0], : spatial[1], : spatial[2]].astype(
                np.int32
            )
        assert x.shape[:-1] == spatial, (
            f"exported for spatial {spatial}, got {x.shape[:-1]}"
        )
        mask = np.asarray(call(variables, jnp.asarray(x.astype(dtype)), starts))
        if meta["pack"]:
            mask = _unpack_bits(mask)
        return mask[None].astype(np.int32)

    return predict


def main(argv: Optional[list] = None) -> None:
    """CLI: ``python serve.py config=unet config.ckpt=... config.watch_dir=...``"""
    import sys

    from .config import compose
    from .logging_utils import get_logger, log_config

    overrides = argv if argv is not None else sys.argv[1:]
    config = compose(overrides, job_name="serve")
    assert config.ckpt, "config.ckpt is required for serve"
    logger = get_logger(config)
    log_config(logger, config)
    export_path = getattr(config, "export_path", None)
    if export_path:
        # AOT export mode: serialize the predict program and exit
        # (config.export_spatial='X, Y, Z' picks the volume shape)
        spatial = getattr(config, "export_spatial", None) or "256, 256, 128"
        if isinstance(spatial, str):
            spatial = tuple(int(v) for v in spatial.split(","))
        predictor = Predictor(config, logger=logger)
        blob = export_predictor(predictor, spatial, path=export_path)
        logger.info(
            f"exported predict program for spatial {tuple(spatial)} "
            f"({len(blob) / 1e6:.2f} MB) -> {export_path}"
        )
        return
    serve(config, logger=logger, once=bool(getattr(config, "serve_once", False)))
