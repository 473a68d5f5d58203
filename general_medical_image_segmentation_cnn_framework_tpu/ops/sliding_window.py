"""Sliding-window whole-volume inference, device-side.

TPU-native re-design of the reference's per-patch Python loop over
TorchIO's GridSampler/GridAggregator (/root/reference/predict.py:98-147):

* the full volume is placed on device ONCE;
* patch gathering is a ``vmap`` of ``lax.dynamic_slice`` over a fixed-size
  batch of grid locations (one compiled program per (volume-shape,
  batch-size), reused across volumes of the same shape);
* the model forward + channel argmax runs on the gathered batch;
* aggregation matches TorchIO's default ``overlap_mode='crop'`` exactly
  (argmax-before-blend, half-overlap border crop; SURVEY hard-part #2).

The model variables are passed as a jit ARGUMENT (not a closure): closed-
over parameters are baked into the HLO as constants, which bloats the
program by the full model size — deadly for remote compilation.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import GridAggregator, grid_locations


def prepare_volume(volume: np.ndarray, input_dtype=None) -> jax.Array:
    """Host [C, X, Y, Z] -> device [X, Y, Z, C], optionally bf16-cast.

    Split out so a prefetch thread can start the NEXT volume's
    host->device transfer while the device scans the current one — on a
    tunneled transport the upload (~205 ms bf16 at 256x256x128) hides
    completely behind the tile scan (~220 ms), measured. Both predict
    entry points accept the returned device array in place of the host
    volume.
    """
    vol_host = np.moveaxis(np.asarray(volume), 0, -1)
    if input_dtype is not None:
        import ml_dtypes  # numpy-level bf16 cast before the transfer

        vol_host = vol_host.astype(
            ml_dtypes.bfloat16 if input_dtype == jnp.bfloat16 else input_dtype
        )
    return jnp.asarray(vol_host)


def _forward_tiles_impl(forward, variables, volume, starts, patch_size):
    """Gather tiles at `starts` from `volume` [X,Y,Z,C], forward, argmax.

    starts: [B, 3] int32. Returns [B, pX, pY, pZ] int32 masks.
    """

    def gather(start):
        return jax.lax.dynamic_slice(
            volume,
            (start[0], start[1], start[2], 0),
            patch_size + (volume.shape[-1],),
        )

    tiles = jax.vmap(gather)(starts)  # [B, pX, pY, pZ, C]
    logits = forward(variables, tiles)  # [B, pX, pY, pZ, out]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


_forward_tiles = partial(jax.jit, static_argnames=("forward", "patch_size"))(
    _forward_tiles_impl
)


def _pack_bits(mask):
    """[..., Z] binary int mask -> [..., Z/8] uint8, little-endian bits.

    Binary masks dominate this framework (out_classes=2 everywhere in the
    reference's configs); the packed volume is 8x fewer bytes on the
    device->host link. Paired end-to-end A/B on the pipelined predict
    path (scripts/ab_bitpack.py, tunneled v5e, unet 256x256x128): 1.41-
    1.48x vols/min across 5 clean rounds (~170 -> ~245).
    Exact: host unpacks with np.unpackbits(bitorder='little').
    """
    z = mask.shape[-1]
    b = mask.reshape(mask.shape[:-1] + (z // 8, 8)).astype(jnp.uint8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def _unpack_bits(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse of _pack_bits: [..., Z/8] uint8 -> [..., Z] int8."""
    bits = np.unpackbits(packed[..., None], axis=-1, bitorder="little")
    return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,)).astype(
        np.int8
    )


_BINARY_CHANNELS_CACHE: dict = {}


def _binary_channels(forward, variables, in_shape, in_dtype) -> bool:
    """True iff the model emits 2 logit channels (trace-only, no compute).

    Cached per (forward, shape, dtype): the eval_shape re-traces the whole
    model on the host, which is pure overhead when the CLI predict loop
    calls this once per volume. The cache holds only bools (never traced
    values — see the lru_cache tracer-leak note in CLAUDE.md) and keys on
    the forward callable itself, which is per-model in every driver.
    """
    key = (forward, tuple(in_shape), jnp.dtype(in_dtype).name)
    hit = _BINARY_CHANNELS_CACHE.get(key)
    if hit is not None:
        return hit
    tile = jax.ShapeDtypeStruct(tuple(in_shape), in_dtype)
    try:
        out = jax.eval_shape(forward, variables, tile)
        res = int(out.shape[-1]) == 2
    except Exception:  # exotic forwards: fall back to unpacked masks
        res = False
    _BINARY_CHANNELS_CACHE[key] = res
    return res


def _crop_keep_mask(starts, patch_size, spatial, half):
    """[pX, pY, pZ] bool: which voxels of a tile at `starts` survive the
    border-aware half-overlap crop (TorchIO crop semantics)."""
    keeps = []
    for d in range(3):
        idx = jnp.arange(patch_size[d])
        c0 = jnp.where(starts[d] == 0, 0, half[d])
        c1 = jnp.where(starts[d] + patch_size[d] == spatial[d], 0, half[d])
        keeps.append((idx >= c0) & (idx < patch_size[d] - c1))
    return (
        keeps[0][:, None, None] & keeps[1][None, :, None] & keeps[2][None, None, :]
    )


@partial(
    jax.jit,
    static_argnames=(
        "forward", "patch_size", "batch_size", "overlap", "mesh", "spatial",
        "pack",
    ),
)
def _predict_volume_crop(
    forward, variables, volume, starts, patch_size, batch_size, overlap,
    mesh=None, spatial=None, pack=False,
):
    """Whole-volume crop-mode prediction fully on device: ONE program that
    scans tile chunks AND aggregates (border-aware half-overlap crop, later
    tiles overwrite) into an int8 mask volume — only the final [X, Y, Z]
    mask crosses the host link, not every tile (a large win on tunneled
    transports; the reference round-trips every patch,
    /root/reference/predict.py:141-146). ``spatial`` overrides the output/
    border shape when ``volume`` is bucket-padded beyond the true extent."""
    if spatial is None:
        spatial = volume.shape[:-1]
    half = tuple(o // 2 for o in overlap)
    chunked = starts.reshape(-1, batch_size, 3)
    out0 = jnp.zeros(spatial, jnp.int8)

    def body(out, chunk):
        if mesh is not None:
            chunk = _shard_chunk(chunk, mesh)
        masks = _forward_tiles_impl(forward, variables, volume, chunk, patch_size)
        masks = masks.astype(jnp.int8)

        def write(i, vol_out):
            start = chunk[i]
            keep = _crop_keep_mask(start, patch_size, spatial, half)
            cur = jax.lax.dynamic_slice(vol_out, start, patch_size)
            upd = jnp.where(keep, masks[i], cur)
            return jax.lax.dynamic_update_slice(vol_out, upd, start)

        out = jax.lax.fori_loop(0, batch_size, write, out)
        return out, None

    out, _ = jax.lax.scan(body, out0, chunked)
    return _pack_bits(out) if pack else out


@partial(
    jax.jit,
    static_argnames=(
        "forward", "patch_size", "batch_size", "mesh", "spatial", "pack"
    ),
)
def _predict_volume_mean_logits(
    forward, variables, volume, starts, n_valid, patch_size, batch_size,
    mesh=None, spatial=None, pack=False,
):
    """Whole-volume soft-blend prediction on device: accumulate logits +
    counts per voxel inside the scan, argmax once at the end. Only the
    final int8 mask leaves the device. Tiles with global index >= n_valid
    (batch padding) get zero weight."""
    if spatial is None:
        spatial = volume.shape[:-1]
    chunked = starts.reshape(-1, batch_size, 3)

    def gather(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0),
            patch_size + (volume.shape[-1],),
        )

    def body(carry, xs):
        acc, cnt = carry
        chunk, ci = xs
        if mesh is not None:
            chunk = _shard_chunk(chunk, mesh)
        tiles = jax.vmap(gather)(chunk)
        logits = forward(variables, tiles).astype(jnp.float32)
        if mesh is not None:
            logits = _shard_chunk(logits, mesh)

        def write(i, carry):
            acc, cnt = carry
            start = chunk[i]
            w = jnp.where(ci * batch_size + i < n_valid, 1.0, 0.0)
            s4 = (start[0], start[1], start[2], 0)
            cur = jax.lax.dynamic_slice(acc, s4, patch_size + (acc.shape[-1],))
            acc = jax.lax.dynamic_update_slice(acc, cur + w * logits[i], s4)
            curc = jax.lax.dynamic_slice(cnt, start, patch_size)
            cnt = jax.lax.dynamic_update_slice(cnt, curc + w, start)
            return acc, cnt

        acc, cnt = jax.lax.fori_loop(0, batch_size, write, (acc, cnt))
        return (acc, cnt), None

    n_out = jax.eval_shape(
        lambda v, t: forward(v, t),
        variables,
        jax.ShapeDtypeStruct((batch_size,) + patch_size + (volume.shape[-1],), volume.dtype),
    ).shape[-1]
    acc0 = jnp.zeros(spatial + (n_out,), jnp.float32)
    cnt0 = jnp.zeros(spatial, jnp.float32)
    (acc, cnt), _ = jax.lax.scan(
        body, (acc0, cnt0), (chunked, jnp.arange(chunked.shape[0]))
    )
    mask = jnp.argmax(
        acc / jnp.maximum(cnt, 1.0)[..., None], axis=-1
    ).astype(jnp.int8)
    return _pack_bits(mask) if pack else mask


def _shard_chunk(chunk, mesh):
    """Constrain a [bs, ...] chunk to be sharded over the mesh 'data' axis
    (GSPMD splits the gather + forward across devices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*(("data",) + (None,) * (chunk.ndim - 1)))
    return jax.lax.with_sharding_constraint(chunk, NamedSharding(mesh, spec))


@partial(jax.jit, static_argnames=("forward", "patch_size", "batch_size", "mesh"))
def _forward_all_tiles(forward, variables, volume, starts, patch_size, batch_size, mesh=None):
    """ONE dispatch per volume: lax.scan over tile chunks.

    starts: [n_chunks * batch_size, 3]. Returns [N, pX, pY, pZ] int8 masks.
    A single XLA program (the SURVEY §7 'batched scan' design) — on
    high-latency transports this collapses per-chunk dispatch round trips
    into one. With `mesh`, each chunk's tiles shard over the 'data' axis.
    """
    chunked = starts.reshape(-1, batch_size, 3)

    def body(_, chunk):
        if mesh is not None:
            chunk = _shard_chunk(chunk, mesh)
        masks = _forward_tiles_impl(forward, variables, volume, chunk, patch_size)
        if mesh is not None:
            masks = _shard_chunk(masks, mesh)
        return None, masks.astype(jnp.int8)

    _, masks = jax.lax.scan(body, None, chunked)
    return masks.reshape(-1, *patch_size)


@partial(jax.jit, static_argnames=("forward", "patch_size", "batch_size", "mesh"))
def _forward_all_tiles_logits(forward, variables, volume, starts, patch_size, batch_size, mesh=None):
    """Like _forward_all_tiles but returns raw logits [N, p..., C] for soft
    (mean-logits) blending."""
    chunked = starts.reshape(-1, batch_size, 3)

    def gather(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0),
            patch_size + (volume.shape[-1],),
        )

    def body(_, chunk):
        if mesh is not None:
            chunk = _shard_chunk(chunk, mesh)
        tiles = jax.vmap(gather)(chunk)
        out = forward(variables, tiles).astype(jnp.float32)
        if mesh is not None:
            out = _shard_chunk(out, mesh)
        return None, out

    _, logits = jax.lax.scan(body, None, chunked)
    return logits.reshape((-1,) + tuple(patch_size) + (logits.shape[-1],))


@partial(jax.jit, static_argnames=("forward", "mesh", "pack"))
def _whole_volume_jit(forward, variables, x, mesh=None, pack=False):
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # spatial partitioning: shard H over the mesh; GSPMD inserts the
        # halo exchanges for every conv automatically
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, None, "data", None, None))
        )
    logits = forward(variables, x)
    mask = jnp.argmax(logits, axis=-1).astype(jnp.int8)
    return _pack_bits(mask) if pack else mask


def whole_volume_predict(
    forward: Callable,
    variables,
    volume: np.ndarray,
    pad_multiple: int = 16,
    mesh=None,
    input_dtype=None,
    on_dispatch: Callable | None = None,
    sync: bool = True,
) -> np.ndarray:
    """Single-shot whole-volume inference — no tiling at all.

    TPU HBM holds the full activation pyramid of typical volumes (a
    256x256x128 UNet3D eval peaks well under 3 GB), so ONE forward pass
    replaces the reference's GridSampler loop entirely: ~2x less compute
    than overlapping 128^3 tiles and zero crop seams (84 ms device-side on
    a v5e vs 1.26 s tiled). Spatial dims are zero-padded to
    ``pad_multiple`` (the network's total downsampling factor) and the
    mask cropped back. With ``mesh``, the volume is spatially sharded over
    the devices and GSPMD inserts halo exchanges (multi-chip serving for
    volumes larger than one chip's HBM).

    The sliding-window path remains the reference-parity default
    (predictions differ at former tile borders — here every voxel sees
    full context). ``input_dtype=jnp.bfloat16`` halves the host->device
    transfer (measured 56 -> 81 vols/min end-to-end on a tunneled v5e,
    zero mask differences vs f32 upload for a bf16-compute model).
    Returns [1, X, Y, Z] int mask.
    """
    if isinstance(volume, jax.Array):  # prepare_volume output: [X, Y, Z, C]
        spatial = volume.shape[:-1]
        padded = tuple(-(-s // pad_multiple) * pad_multiple for s in spatial)
        x = volume[None]
        if padded != tuple(spatial):
            # device-side pad: a tiny shape-stable program, cached across
            # volumes — keeps the prefetch-uploaded array usable directly
            pads = (
                [(0, 0)]
                + [(0, p - s) for p, s in zip(padded, spatial)]
                + [(0, 0)]
            )
            x = jnp.pad(x, pads)
    else:
        spatial = volume.shape[1:]
        padded = tuple(-(-s // pad_multiple) * pad_multiple for s in spatial)
        vol = np.moveaxis(volume, 0, -1)[None]  # [1, X, Y, Z, C]
        if padded != tuple(spatial):
            pads = (
                [(0, 0)]
                + [(0, p - s) for p, s in zip(padded, spatial)]
                + [(0, 0)]
            )
            vol = np.pad(vol, pads)
        if input_dtype is not None:
            import ml_dtypes  # numpy-level bf16 cast before the transfer

            vol = vol.astype(
                ml_dtypes.bfloat16 if input_dtype == jnp.bfloat16 else input_dtype
            )
        x = jnp.asarray(vol)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    # binary masks come back bit-packed (8x fewer device->host bytes; the
    # int8 fetch is a measured 139 ms per 256x256x128 volume on tunneled
    # transports vs 54 ms packed) — exact, auto-detected from the logit
    # channel count, host unpacks below
    pack = padded[-1] % 8 == 0 and _binary_channels(
        forward, variables, x.shape, x.dtype
    )
    mask_dev = _whole_volume_jit(forward, variables, x, mesh, pack=pack)
    if on_dispatch is not None:
        # the jitted forward is now ENQUEUED (JAX async dispatch): signal
        # the prefetch thread that it may start the next volume's bulk
        # upload. Uploads issued BEFORE the dispatch serialize the dispatch
        # behind ~200 ms of transfer on single-connection transports
        # (measured, BASELINE.md r6) — this ordering hook removes that.
        on_dispatch()

    def _finish():
        mask = np.asarray(mask_dev)
        if pack:
            mask = _unpack_bits(mask)
        return mask[:, : spatial[0], : spatial[1], : spatial[2]].astype(
            np.int32
        )

    return _finish() if sync else _finish


def sliding_window_predict(
    forward: Callable,
    variables,
    volume: np.ndarray,
    patch_size: Sequence[int],
    patch_overlap: Sequence[int],
    batch_size: int = 4,
    overlap_mode: str = "crop",
    mesh=None,
    aggregate: str = "device",
    true_spatial=None,
    input_dtype=None,
    on_dispatch: Callable | None = None,
    sync: bool = True,
) -> np.ndarray:
    """Predict a full volume.

    forward:   jittable ``(variables, tiles[B, pX, pY, pZ, C]) -> logits``.
               Must be a stable callable (same object across calls) so the
               jit cache hits across volumes.
    variables: model params/batch_stats pytree (a jit argument).
    volume:    [C, X, Y, Z] numpy (already normalized), or a device
               [X, Y, Z, C] array from ``prepare_volume`` (lets a
               prefetch thread overlap the upload with the previous
               volume's scan; ``input_dtype`` is then ignored).
    overlap_mode:
      'crop'        — argmax per tile, half-overlap border crop: byte-
                      identical to the reference's TorchIO aggregation;
      'mean_logits' — average raw logits across overlapping tiles, argmax
                      once at the end (soft blending; smoother seams —
                      capability extension).
    mesh:      optional jax.sharding.Mesh with a 'data' axis: the tile
               batch is sharded over it (volume + variables replicated),
               so each scan step runs batch_size/n_devices tiles per chip —
               whole-volume inference scales across the mesh with no
               aggregation change (serving-scale capability extension).
    aggregate:
      'device' (default) — the overlap aggregation runs INSIDE the scan
               program; only the final [X, Y, Z] int8 mask crosses the
               host link (the reference round-trips every patch).
               Identical output to 'host' (tested).
      'host'   — tiles come back to the host and aggregate through
               GridAggregator (the TorchIO-shaped reference path).
    true_spatial:
               the real volume extent when ``volume`` is padded beyond it
               (shape bucketing): the tile grid, border-crop rules, and
               output shape all follow the TRUE extent, so bucketed
               predictions are byte-identical to unbucketed ones.
    on_dispatch:
               called once the device program for this volume is ENQUEUED
               (before the blocking mask fetch). A prefetch thread should
               gate its next bulk upload on this signal: an upload issued
               between mask-fetch and the next dispatch serializes the
               dispatch behind ~200 ms of transfer on single-connection
               transports (measured; predict.py wires a semaphore).
    sync:      False returns a zero-arg thunk instead of the mask: the
               device program is dispatched, but the result download and
               any host-side aggregation run only when the thunk is
               called. Lets the caller software-pipeline volumes
               (dispatch volume i, then fetch volume i-1's mask while
               scan i runs) — predict.py does.
    input_dtype:
               upload dtype for the volume. ``jnp.bfloat16`` halves the
               host->device transfer, which DOMINATES the tunneled
               per-volume cost (measured 256x256x128: f32 upload ~450 ms
               vs tile scan ~231 ms; bf16 upload ~205 ms). EXACT for a
               bf16-compute model: its first conv casts the gathered tile
               to bf16 anyway, so pre-casting on the host changes nothing
               (0 / 8.4M mask mismatches measured) — same contract as
               ``whole_volume_predict``.
    Returns [1, X, Y, Z] int mask.
    """
    patch_size = tuple(int(p) for p in patch_size)
    if isinstance(volume, jax.Array):  # prepare_volume output: [X, Y, Z, C]
        vol_dev = volume
        vol_spatial = volume.shape[:-1]
    else:
        vol_dev = prepare_volume(volume, input_dtype)
        vol_spatial = volume.shape[1:]
    spatial = tuple(true_spatial) if true_spatial is not None else vol_spatial
    locations = grid_locations(spatial, patch_size, patch_overlap)
    n = len(locations)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        if batch_size % n_data:
            # round UP to the next multiple of the data axis (padding already
            # handles surplus tiles) so sharding never shrinks the tile batch
            new_bs = n_data * -(-batch_size // n_data)
            import logging

            logging.getLogger("gmist.sliding_window").info(
                "batch_size %d not divisible by data axis %d; using %d",
                batch_size, n_data, new_bs,
            )
            batch_size = new_bs
        vol_dev = jax.device_put(vol_dev, NamedSharding(mesh, P()))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))

    # pad location count to a multiple of batch_size -> single compiled shape
    n_pad = (-n) % batch_size
    starts = locations[:, :3].astype(np.int32)
    if n_pad:
        starts = np.concatenate([starts, np.repeat(starts[-1:], n_pad, axis=0)])

    starts_dev = jnp.asarray(starts)
    spatial_static = spatial if true_spatial is not None else None
    # binary masks leave the device bit-packed (8x fewer bytes; measured
    # 139 -> 54 ms per 256x256x128 volume on the tunneled transport)
    pack = spatial[2] % 8 == 0 and _binary_channels(
        forward, variables,
        (batch_size,) + patch_size + (vol_dev.shape[-1],), vol_dev.dtype,
    )

    def _unpack(mask):
        return _unpack_bits(mask) if pack else mask

    def _result(dev, fmt):
        # program enqueued (async dispatch) -> let the prefetch thread
        # start the next upload, THEN block on the result download.
        # sync=False defers that download (and host post-processing) into
        # the returned thunk, so the caller can dispatch the NEXT volume's
        # scan before fetching this one's mask — the fetch then waits on a
        # scan that has already had a full pipeline period to finish.
        if on_dispatch is not None:
            on_dispatch()
        if sync:
            return fmt(np.asarray(dev))
        return lambda: fmt(np.asarray(dev))

    if overlap_mode == "mean_logits":
        if aggregate == "device":
            return _result(
                _predict_volume_mean_logits(
                    forward, variables, vol_dev, starts_dev, jnp.int32(n),
                    patch_size, batch_size, mesh, spatial_static, pack=pack,
                ),
                lambda mask: _unpack(mask)[None].astype(np.int32),
            )

        def _agg_logits(logits):
            agg = GridAggregator(
                spatial, patch_overlap, overlap_mode="average",
                num_channels=logits.shape[-1], dtype=np.float32,
            )
            agg.add_batch(np.moveaxis(logits[:n], -1, 1), locations)
            return np.argmax(agg.get_output_tensor(), axis=0)[None].astype(
                np.int32
            )

        return _result(
            _forward_all_tiles_logits(
                forward, variables, vol_dev, starts_dev, patch_size,
                batch_size, mesh,
            ),
            _agg_logits,
        )

    # device aggregation implements crop semantics only; other modes
    # (e.g. 'average' mask blending) go through the host GridAggregator
    if aggregate == "device" and overlap_mode == "crop":
        return _result(
            _predict_volume_crop(
                forward, variables, vol_dev, starts_dev, patch_size,
                batch_size, tuple(int(o) for o in patch_overlap), mesh,
                spatial_static, pack=pack,
            ),
            lambda mask: _unpack(mask)[None].astype(np.int32),
        )

    def _agg_masks(all_masks):
        aggregator = GridAggregator(
            spatial, patch_overlap, overlap_mode=overlap_mode,
            num_channels=1, dtype=np.int32,
        )
        aggregator.add_batch(all_masks[:n, None].astype(np.int32), locations)
        return aggregator.get_output_tensor()

    return _result(
        _forward_all_tiles(
            forward, variables, vol_dev, starts_dev, patch_size,
            batch_size, mesh,
        ),
        _agg_masks,
    )
