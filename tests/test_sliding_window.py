"""Sliding-window predict: TorchIO-parity aggregation through the
single-dispatch scan path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
    sliding_window_predict,
)


def _threshold_forward(variables, tiles):
    """A 'model' whose argmax mask is (tile > 0): logits ch1 = x, ch0 = 0."""
    del variables
    zeros = jnp.zeros_like(tiles[..., :1])
    return jnp.concatenate([zeros, tiles[..., :1]], axis=-1)


def test_sliding_window_equals_direct_threshold():
    """With a pointwise model, tiled+aggregated == whole-volume result."""
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(1, 24, 20, 28)).astype(np.float32)
    mask = sliding_window_predict(
        _threshold_forward, {}, vol, (12, 12, 12), (4, 4, 4), batch_size=3
    )
    expected = (vol > 0).astype(np.int32)
    np.testing.assert_array_equal(mask, expected)


def test_sliding_window_batch_padding():
    """Tile count not divisible by batch_size still covers everything."""
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    for bs in (1, 2, 5, 7):
        mask = sliding_window_predict(
            _threshold_forward, {}, vol, (12, 12, 12), (4, 4, 4), batch_size=bs
        )
        np.testing.assert_array_equal(mask, (vol > 0).astype(np.int32))


def test_mean_logits_blend_matches_pointwise():
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    mask = sliding_window_predict(
        _threshold_forward, {}, vol, (12, 12, 12), (4, 4, 4),
        batch_size=3, overlap_mode="mean_logits",
    )
    np.testing.assert_array_equal(mask, (vol > 0).astype(np.int32))


# ---------------------------------------------------------------------------
# Golden aggregation tests with a LOCATION-DEPENDENT model.
#
# A pointwise model cannot distinguish crop / average / overwrite policies
# (every policy yields the same output). The model below makes the
# prediction depend on the voxel's position WITHIN the patch, so a wrong
# overlap policy produces a different volume. The expected output is
# computed by an independent per-patch numpy loop implementing the policy
# the reference relies on (TorchIO GridSampler/GridAggregator 'crop':
# starts advance by patch-overlap with a final start clamped to the
# boundary; each patch writes its half-overlap-cropped core, keeping the
# full extent where it touches the volume border; later patches overwrite
# — /root/reference/predict.py:100,117-118,146).
# ---------------------------------------------------------------------------

_N_CLASSES = 5


def _position_dependent_forward(variables, tiles):
    """argmax class = (round(4*value) + ix+iy+iz within patch) % N."""
    del variables
    px, py, pz = tiles.shape[1:4]
    ramp = (
        jnp.arange(px)[:, None, None]
        + jnp.arange(py)[None, :, None]
        + jnp.arange(pz)[None, None, :]
    )
    cls = (jnp.round(4.0 * tiles[..., 0]).astype(jnp.int32) + ramp) % _N_CLASSES
    return jax.nn.one_hot(cls, _N_CLASSES)


def _expected_crop(vol, patch, overlap):
    """Independent loop-based implementation of the crop aggregation."""
    spatial = vol.shape[1:]

    def starts(size, p, o):
        step = p - o
        ss = list(range(0, size - p + 1, step))
        if ss[-1] != size - p:
            ss.append(size - p)
        return ss

    out = np.zeros(spatial, np.int32)
    ramp = (
        np.arange(patch[0])[:, None, None]
        + np.arange(patch[1])[None, :, None]
        + np.arange(patch[2])[None, None, :]
    )
    half = [o // 2 for o in overlap]
    for i in starts(spatial[0], patch[0], overlap[0]):
        for j in starts(spatial[1], patch[1], overlap[1]):
            for k in starts(spatial[2], patch[2], overlap[2]):
                tile = vol[0, i:i + patch[0], j:j + patch[1], k:k + patch[2]]
                pred = (np.round(4.0 * tile).astype(np.int32) + ramp) % _N_CLASSES
                lo = [i, j, k]
                c0 = [0 if lo[d] == 0 else half[d] for d in range(3)]
                c1 = [
                    0 if lo[d] + patch[d] == spatial[d] else half[d] for d in range(3)
                ]
                out[
                    i + c0[0]:i + patch[0] - c1[0],
                    j + c0[1]:j + patch[1] - c1[1],
                    k + c0[2]:k + patch[2] - c1[2],
                ] = pred[
                    c0[0]:patch[0] - c1[0],
                    c0[1]:patch[1] - c1[1],
                    c0[2]:patch[2] - c1[2],
                ]
    return out[None]


def test_crop_aggregation_location_dependent_model():
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(1, 20, 24, 44)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    got = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap, batch_size=3
    )
    np.testing.assert_array_equal(got, _expected_crop(vol, patch, overlap))


def test_crop_aggregation_default_reference_overlap():
    """The reference's default patch_overlap=(4,4,36) config shape
    (clamped per-dim below the patch), non-uniform volume."""
    rng = np.random.default_rng(4)
    vol = rng.normal(size=(1, 28, 26, 40)).astype(np.float32)
    patch = (16, 16, 16)
    # (4, 4, 36) clamped per-dim below the patch, then rounded down to even
    # (tio requires even overlap so crop borders tile exactly)
    overlap = tuple(min(o, p - 1) for o, p in zip((4, 4, 36), patch))
    overlap = tuple(o - (o % 2) for o in overlap)
    got = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap, batch_size=4
    )
    np.testing.assert_array_equal(got, _expected_crop(vol, patch, overlap))


def test_crop_differs_from_naive_overwrite():
    """Sanity: the location-dependent model DOES discriminate policies —
    naive un-cropped overwrite must differ from crop aggregation."""
    rng = np.random.default_rng(5)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    got = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap, batch_size=3
    )
    # naive overwrite: full patches written in order, no cropping
    spatial = vol.shape[1:]
    naive = np.zeros(spatial, np.int32)
    ramp = (
        np.arange(patch[0])[:, None, None]
        + np.arange(patch[1])[None, :, None]
        + np.arange(patch[2])[None, None, :]
    )
    def starts(size, p, o):
        step = p - o
        ss = list(range(0, size - p + 1, step))
        if ss[-1] != size - p:
            ss.append(size - p)
        return ss
    for i in starts(spatial[0], patch[0], overlap[0]):
        for j in starts(spatial[1], patch[1], overlap[1]):
            for k in starts(spatial[2], patch[2], overlap[2]):
                tile = vol[0, i:i + patch[0], j:j + patch[1], k:k + patch[2]]
                naive[i:i + patch[0], j:j + patch[1], k:k + patch[2]] = (
                    np.round(4.0 * tile).astype(np.int32) + ramp
                ) % _N_CLASSES
    assert (got[0] != naive).any(), "test model failed to discriminate policies"


def test_device_aggregation_matches_host():
    """The in-scan device aggregation (only the final mask leaves the
    device) must be byte-identical to the host GridAggregator path, for
    both crop and mean_logits, including non-divisible batch padding."""
    rng = np.random.default_rng(8)
    vol = rng.normal(size=(1, 20, 24, 44)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    for mode in ("crop", "mean_logits"):
        for bs in (3, 4, 7):
            dev = sliding_window_predict(
                _position_dependent_forward, {}, vol, patch, overlap,
                batch_size=bs, overlap_mode=mode, aggregate="device",
            )
            host = sliding_window_predict(
                _position_dependent_forward, {}, vol, patch, overlap,
                batch_size=bs, overlap_mode=mode, aggregate="host",
            )
            np.testing.assert_array_equal(dev, host)


def test_average_mode_routes_to_host_aggregator():
    """overlap_mode='average' has no device implementation — it must go
    through GridAggregator (and not silently get crop semantics)."""
    rng = np.random.default_rng(9)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    avg_dev = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap,
        batch_size=3, overlap_mode="average", aggregate="device",
    )
    avg_host = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap,
        batch_size=3, overlap_mode="average", aggregate="host",
    )
    np.testing.assert_array_equal(avg_dev, avg_host)
    crop = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap,
        batch_size=3, overlap_mode="crop",
    )
    assert (avg_dev != crop).any(), "average mode silently produced crop output"


def test_sharded_inference_matches_unsharded():
    """Tile batch sharded over an 8-device mesh == single-device result
    (multi-chip serving path; GSPMD splits gather+forward per chunk)."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(7)
    vol = rng.normal(size=(1, 20, 24, 28)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    want = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap, batch_size=8
    )
    got = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap, batch_size=8,
        mesh=mesh,
    )
    np.testing.assert_array_equal(got, want)
    # also the soft-blending path
    want_m = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap, batch_size=8,
        overlap_mode="mean_logits",
    )
    got_m = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap, batch_size=8,
        overlap_mode="mean_logits", mesh=mesh,
    )
    np.testing.assert_array_equal(got_m, want_m)


def test_bucket_padded_volume_matches_unpadded():
    """true_spatial: a bucket-padded volume must produce byte-identical
    predictions to the unpadded one (grid + crop rules follow the true
    extent; the padding only exists to share compiled programs)."""
    rng = np.random.default_rng(12)
    vol = rng.normal(size=(1, 20, 24, 27)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    padded = np.pad(vol, [(0, 0), (0, 12), (0, 8), (0, 5)])  # to 32^3
    for mode in ("crop", "mean_logits"):
        want = sliding_window_predict(
            _position_dependent_forward, {}, vol, patch, overlap,
            batch_size=3, overlap_mode=mode,
        )
        got = sliding_window_predict(
            _position_dependent_forward, {}, padded, patch, overlap,
            batch_size=3, overlap_mode=mode, true_spatial=(20, 24, 27),
        )
        np.testing.assert_array_equal(got, want)


def test_whole_volume_predict_pointwise():
    """Single-shot whole-volume inference == direct thresholding for a
    pointwise model, including non-multiple-of-16 shapes (pad + crop)."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        whole_volume_predict,
    )

    rng = np.random.default_rng(10)
    vol = rng.normal(size=(1, 24, 20, 28)).astype(np.float32)
    mask = whole_volume_predict(_threshold_forward, {}, vol)
    np.testing.assert_array_equal(mask, (vol > 0).astype(np.int32))
    vol2 = rng.normal(size=(1, 19, 21, 23)).astype(np.float32)  # ragged dims
    mask2 = whole_volume_predict(_threshold_forward, {}, vol2)
    np.testing.assert_array_equal(mask2, (vol2 > 0).astype(np.int32))


def test_whole_volume_spatial_sharding_matches():
    """Spatially-sharded whole-volume inference (GSPMD halo exchange) must
    match the unsharded result on a real conv model."""
    from jax.sharding import Mesh

    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        whole_volume_predict,
    )

    class _TinyConvNet:
        """3-layer conv net closure (stable callable for the jit cache)."""

        def __call__(self, variables, x):
            w1, w2 = variables["w1"], variables["w2"]
            y = jax.lax.conv_general_dilated(
                x, w1, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            y = jax.nn.relu(y)
            return jax.lax.conv_general_dilated(
                y, w2, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

    rng = np.random.default_rng(11)
    variables = {
        "w1": jnp.asarray(rng.normal(size=(3, 3, 3, 1, 4)).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(3, 3, 3, 4, 3)).astype(np.float32)),
    }
    vol = rng.normal(size=(1, 16, 32, 16)).astype(np.float32)
    net = _TinyConvNet()
    want = whole_volume_predict(net, variables, vol)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    got = whole_volume_predict(net, variables, vol, mesh=mesh)
    np.testing.assert_array_equal(got, want)


def test_mean_logits_matches_independent_average():
    rng = np.random.default_rng(6)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    got = sliding_window_predict(
        _position_dependent_forward, {}, vol, patch, overlap,
        batch_size=3, overlap_mode="mean_logits",
    )
    spatial = vol.shape[1:]
    acc = np.zeros(spatial + (_N_CLASSES,), np.float64)
    cnt = np.zeros(spatial, np.float64)
    ramp = (
        np.arange(patch[0])[:, None, None]
        + np.arange(patch[1])[None, :, None]
        + np.arange(patch[2])[None, None, :]
    )
    def starts(size, p, o):
        step = p - o
        ss = list(range(0, size - p + 1, step))
        if ss[-1] != size - p:
            ss.append(size - p)
        return ss
    for i in starts(spatial[0], patch[0], overlap[0]):
        for j in starts(spatial[1], patch[1], overlap[1]):
            for k in starts(spatial[2], patch[2], overlap[2]):
                tile = vol[0, i:i + patch[0], j:j + patch[1], k:k + patch[2]]
                cls = (np.round(4.0 * tile).astype(np.int32) + ramp) % _N_CLASSES
                onehot = np.eye(_N_CLASSES)[cls]
                acc[i:i + patch[0], j:j + patch[1], k:k + patch[2]] += onehot
                cnt[i:i + patch[0], j:j + patch[1], k:k + patch[2]] += 1
    expected = np.argmax(acc / cnt[..., None], axis=-1).astype(np.int32)[None]
    np.testing.assert_array_equal(got, expected)


def test_bf16_upload_exact_for_bf16_compute_model():
    """input_dtype=bf16 halves the host->device volume transfer and is
    EXACT for a bf16-compute model: the forward casts gathered tiles to
    bf16 anyway, and bf16 values round-trip the pre-cast unchanged.
    (Measured on hardware: 0 / 8.4M mask mismatches at 256^3x128 and the
    upload is the dominant per-volume cost — see docstring.)"""
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(1, 24, 20, 28)).astype(np.float32)
    w = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32))

    def bf16_forward(variables, tiles):
        del variables
        x = tiles.astype(jnp.bfloat16)  # what a dtype=bf16 Flax conv does
        return (x @ w.astype(jnp.bfloat16)).astype(jnp.float32)

    kw = dict(patch_size=(12, 12, 12), patch_overlap=(4, 4, 4), batch_size=3)
    m_f32 = sliding_window_predict(bf16_forward, {}, vol, **kw)
    m_bf16 = sliding_window_predict(
        bf16_forward, {}, vol, input_dtype=jnp.bfloat16, **kw
    )
    np.testing.assert_array_equal(m_f32, m_bf16)


def test_prepared_device_volume_matches_host_paths():
    """prepare_volume + device-array input == host numpy input, for both
    sliding-window (incl. bucketed true_spatial) and whole-volume entry
    points — the contract the pipelined predict loader relies on."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        prepare_volume,
        whole_volume_predict,
    )

    rng = np.random.default_rng(11)
    vol = rng.normal(size=(1, 24, 20, 28)).astype(np.float32)

    kw = dict(patch_size=(12, 12, 12), patch_overlap=(4, 4, 4), batch_size=3)
    m_host = sliding_window_predict(_threshold_forward, {}, vol, **kw)
    m_dev = sliding_window_predict(
        _threshold_forward, {}, prepare_volume(vol), **kw
    )
    np.testing.assert_array_equal(m_host, m_dev)

    # bucket-padded device volume with true_spatial
    pad = np.pad(vol, [(0, 0), (0, 8), (0, 12), (0, 4)])
    m_bucket = sliding_window_predict(
        _threshold_forward, {}, prepare_volume(pad),
        true_spatial=(24, 20, 28), **kw
    )
    np.testing.assert_array_equal(m_host, m_bucket)

    # whole-volume: device input pads on device (jnp.pad) when needed
    w_host = whole_volume_predict(_threshold_forward, {}, vol, pad_multiple=16)
    w_dev = whole_volume_predict(
        _threshold_forward, {}, prepare_volume(vol), pad_multiple=16
    )
    np.testing.assert_array_equal(w_host, w_dev)


@pytest.mark.quick
def test_on_dispatch_fires_once_and_output_unchanged():
    """on_dispatch (the upload-ordering hook the pipelined predict loader
    gates its next bulk transfer on) fires exactly once per volume, on
    every aggregation path, and never changes the prediction."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        whole_volume_predict,
    )

    rng = np.random.default_rng(13)
    vol = rng.normal(size=(1, 24, 20, 28)).astype(np.float32)
    kw = dict(patch_size=(12, 12, 12), patch_overlap=(4, 4, 4), batch_size=3)

    for mode_kw in (
        dict(),  # crop + device aggregation (the CLI default)
        dict(aggregate="host"),
        dict(overlap_mode="mean_logits"),
        dict(overlap_mode="mean_logits", aggregate="host"),
    ):
        calls = []
        base = sliding_window_predict(_threshold_forward, {}, vol, **kw, **mode_kw)
        hooked = sliding_window_predict(
            _threshold_forward, {}, vol, on_dispatch=lambda: calls.append(1),
            **kw, **mode_kw,
        )
        assert len(calls) == 1, mode_kw
        np.testing.assert_array_equal(base, hooked)

    calls = []
    w_base = whole_volume_predict(_threshold_forward, {}, vol, pad_multiple=16)
    w_hooked = whole_volume_predict(
        _threshold_forward, {}, vol, pad_multiple=16,
        on_dispatch=lambda: calls.append(1),
    )
    assert len(calls) == 1
    np.testing.assert_array_equal(w_base, w_hooked)


@pytest.mark.quick
def test_deferred_fetch_matches_sync():
    """sync=False returns a thunk whose result is identical to the sync
    path, on every aggregation mode and for whole-volume — the contract
    the software-pipelined predict loop (dispatch i, fetch i-1) relies on."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        whole_volume_predict,
    )

    rng = np.random.default_rng(17)
    vol = rng.normal(size=(1, 24, 20, 28)).astype(np.float32)
    kw = dict(patch_size=(12, 12, 12), patch_overlap=(4, 4, 4), batch_size=3)

    for mode_kw in (
        dict(),
        dict(aggregate="host"),
        dict(overlap_mode="mean_logits"),
        dict(overlap_mode="mean_logits", aggregate="host"),
    ):
        base = sliding_window_predict(_threshold_forward, {}, vol, **kw, **mode_kw)
        thunk = sliding_window_predict(
            _threshold_forward, {}, vol, sync=False, **kw, **mode_kw
        )
        assert callable(thunk), mode_kw
        np.testing.assert_array_equal(base, thunk())

    w_base = whole_volume_predict(_threshold_forward, {}, vol, pad_multiple=16)
    w_thunk = whole_volume_predict(
        _threshold_forward, {}, vol, pad_multiple=16, sync=False
    )
    assert callable(w_thunk)
    np.testing.assert_array_equal(w_base, w_thunk())


@pytest.mark.quick
def test_binary_mask_bitpack_parity():
    """With 2 logit channels and Z % 8 == 0, the mask leaves the device
    bit-packed (8x fewer bytes) and is unpacked on host — results must be
    byte-identical to the direct computation, for every aggregation mode,
    the whole-volume path, and the bucketed true_spatial path."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        prepare_volume,
        whole_volume_predict,
    )

    rng = np.random.default_rng(23)
    vol = rng.normal(size=(1, 24, 20, 32)).astype(np.float32)  # Z % 8 == 0
    expected = (vol > 0).astype(np.int32)
    kw = dict(patch_size=(12, 12, 16), patch_overlap=(4, 4, 4), batch_size=3)

    for mode_kw in (dict(), dict(overlap_mode="mean_logits")):
        got = sliding_window_predict(_threshold_forward, {}, vol, **kw, **mode_kw)
        np.testing.assert_array_equal(got, expected)

    # bucketed: padded device volume, true Z still % 8 == 0
    pad = np.pad(vol, [(0, 0), (0, 8), (0, 4), (0, 16)])
    got = sliding_window_predict(
        _threshold_forward, {}, prepare_volume(pad),
        true_spatial=(24, 20, 32), **kw,
    )
    np.testing.assert_array_equal(got, expected)

    # whole-volume (pads Z to 32 internally -> packed)
    got = whole_volume_predict(_threshold_forward, {}, vol, pad_multiple=16)
    np.testing.assert_array_equal(got, expected)

    # multi-class (5 channels): must NOT pack, still exact
    got5 = sliding_window_predict(
        _position_dependent_forward, {}, vol, (12, 12, 16), (4, 4, 4),
        batch_size=3,
    )
    np.testing.assert_array_equal(
        got5, _expected_crop(vol, (12, 12, 16), (4, 4, 4))
    )
