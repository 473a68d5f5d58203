"""Data pipeline tests: subject pairing, transforms, patch queue, grid."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from general_medical_image_segmentation_cnn_framework_tpu.data.io import Volume
from general_medical_image_segmentation_cnn_framework_tpu.data.pipeline import (
    GridAggregator,
    PatchQueueDataset,
    get_subjects,
    grid_locations,
)
from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
    RandomAffine,
    RandomBiasField,
    RandomElasticDeformation,
    RandomFlip,
    RandomNoise,
    Subject,
    ZNormalization,
    build_transform,
)


def _subject(shape=(16, 16, 16), seed=0):
    r = np.random.default_rng(seed)
    img = r.normal(size=(1,) + shape).astype(np.float32) + 5.0
    lab = (r.uniform(size=(1,) + shape) > 0.7).astype(np.float32)
    return Subject(Volume(img), Volume(lab))


def test_get_subjects_pairs(tiny_config):
    pairs = get_subjects(tiny_config)
    assert len(pairs) == 3
    for src, gt in pairs:
        assert src.name == gt.name  # sorted pairing


def test_get_subjects_predict_dirs(tiny_config):
    tiny_config.job_name = "predict"
    pairs = get_subjects(tiny_config)
    assert len(pairs) == 2


def test_znormalization():
    s = _subject()
    rng = np.random.default_rng(0)
    out = ZNormalization()(s, rng)
    assert abs(out.source.data.mean()) < 1e-5
    assert abs(out.source.data.std() - 1.0) < 1e-4


def test_random_flip_consistent():
    s = _subject()
    src0, gt0 = s.source.data.copy(), s.gt.data.copy()
    rng = np.random.default_rng(1)  # first uniform < 0.5 -> flip happens
    out = RandomFlip(axes=(0,), flip_probability=1.0)(s, rng)
    np.testing.assert_array_equal(out.source.data, src0[:, ::-1])
    np.testing.assert_array_equal(out.gt.data, gt0[:, ::-1])


def test_random_noise_changes_source_only():
    s = _subject()
    gt0 = s.gt.data.copy()
    out = RandomNoise()(s, np.random.default_rng(3))
    np.testing.assert_array_equal(out.gt.data, gt0)


def test_bias_field_positive_multiplier():
    s = _subject()
    s.source.data = np.ones_like(s.source.data)
    out = RandomBiasField()(s, np.random.default_rng(2))
    assert (out.source.data > 0).all()  # exp(poly) is positive
    assert out.source.data.std() > 0  # field varies spatially


def test_random_affine_label_stays_binary():
    s = _subject()
    out = RandomAffine()(s, np.random.default_rng(5))
    vals = np.unique(out.gt.data)
    assert set(vals.tolist()) <= {0.0, 1.0}
    assert out.source.data.shape == (1, 16, 16, 16)


class _FixedRng:
    """Generator stand-in returning scripted uniform() draws, so affine
    semantics can be asserted analytically (direction, center, handedness)."""

    def __init__(self, draws):
        self._draws = [np.asarray(d, dtype=np.float64) for d in draws]

    def uniform(self, lo, hi, size=None):
        return self._draws.pop(0)


def test_affine_identity_is_exact():
    s = _subject()
    src0 = s.source.data.copy()
    rng = _FixedRng([[1, 1, 1], [0, 0, 0], [0, 0, 0]])
    out = RandomAffine()(s, rng)
    np.testing.assert_allclose(out.source.data, src0, atol=1e-5)


def test_affine_translation_moves_spike_exactly():
    """Integer translation t must land input voxel p at p + t (forward
    convention: x_out = M @ x_in; the resampler uses M^-1)."""
    shape = (11, 11, 11)
    img = np.zeros((1,) + shape, np.float32)
    p = (3, 7, 5)
    img[0][p] = 1.0
    s = Subject(Volume(img.copy()), Volume(img.copy()))
    t = (2.0, -3.0, 1.0)
    rng = _FixedRng([[1, 1, 1], [0, 0, 0], list(t)])
    out = RandomAffine()(s, rng)
    expect = (5, 4, 6)
    assert out.source.data[0][expect] == pytest.approx(1.0, abs=1e-5)
    assert out.gt.data[0][expect] == 1.0
    assert out.gt.data.sum() == 1.0


def test_affine_rotation_90deg_about_center():
    """90 deg about the first axis with odd extent is an exact voxel
    permutation: p -> R(p - c) + c with Rx = [[1,0,0],[0,0,-1],[0,1,0]]."""
    shape = (9, 9, 9)
    img = np.zeros((1,) + shape, np.float32)
    p = np.array([2.0, 3.0, 8.0])
    img[0][tuple(p.astype(int))] = 1.0
    s = Subject(Volume(img.copy()), Volume(img.copy()))
    rng = _FixedRng([[1, 1, 1], [90, 0, 0], [0, 0, 0]])
    out = RandomAffine()(s, rng)
    c = (np.asarray(shape) - 1) / 2.0
    rx = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float64)
    expect = tuple((rx @ (p - c) + c).astype(int))
    assert out.source.data[0][expect] == pytest.approx(1.0, abs=1e-4)
    assert out.gt.data[0][expect] == 1.0


def test_elastic_label_stays_binary():
    s = _subject()
    out = RandomElasticDeformation()(s, np.random.default_rng(6))
    assert set(np.unique(out.gt.data).tolist()) <= {0.0, 1.0}


def test_bspline_field_matches_direct_oracle():
    """The separable evaluation equals a naive per-voxel basis sum on the
    ITK mesh (mesh = n-3 cells over the voxel-center extent, grid origin one
    cell outside, centered cubic B-spline kernel)."""
    from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
        _cubic_bspline_kernel,
    )

    rng = np.random.default_rng(0)
    n, shape = 5, (7, 9, 11)
    grid = rng.normal(size=(3, n, n, n))
    field = RandomElasticDeformation(num_control_points=n).displacement_field(
        grid, shape
    )
    assert field.shape == (3,) + shape

    mesh = n - 3
    for axis in range(3):
        for (x, y, z) in [(0, 0, 0), (3, 4, 5), (6, 8, 10), (1, 7, 2)]:
            acc = 0.0
            for i in range(n):
                for j in range(n):
                    for k in range(n):
                        w = 1.0
                        for coord, idx, size in ((x, i, shape[0]), (y, j, shape[1]), (z, k, shape[2])):
                            h = (size - 1) / mesh
                            s = coord / h + 1.0
                            w *= _cubic_bspline_kernel(np.asarray([s - idx]))[0]
                        acc += w * grid[axis, i, j, k]
            np.testing.assert_allclose(field[axis, x, y, z], acc, rtol=1e-10, atol=1e-12)


def test_bspline_partition_of_unity():
    """Constant control coefficients reproduce the constant everywhere in the
    transform domain — the defining property of a valid B-spline basis."""
    n, shape = 7, (12, 13, 14)
    grid = np.full((3, n, n, n), 2.5)
    field = RandomElasticDeformation(num_control_points=n).displacement_field(
        grid, shape
    )
    np.testing.assert_allclose(field, 2.5, rtol=1e-12)


def test_elastic_borders_nearly_still():
    """With tio's 2 locked control layers the displacement at the volume
    faces is an order of magnitude below the interior maximum."""
    t = RandomElasticDeformation()
    rng = np.random.default_rng(11)
    n = t.num_control_points
    grid = rng.uniform(-t.max_displacement, t.max_displacement, size=(3, n, n, n))
    for b in range(t.locked_borders):
        grid[:, [b, n - 1 - b], :, :] = 0
        grid[:, :, [b, n - 1 - b], :] = 0
        grid[:, :, :, [b, n - 1 - b]] = 0
    field = t.displacement_field(grid, (24, 24, 24))
    border = np.abs(np.concatenate([
        field[:, [0, -1], :, :].ravel(),
        field[:, :, [0, -1], :].ravel(),
        field[:, :, :, [0, -1]].ravel(),
    ]))
    # at a face the locked axis leaves weight <= B3(1) = 1/6 on free points
    assert border.max() <= t.max_displacement / 6 + 1e-9
    assert border.max() < 0.5 * np.abs(field).max()
    assert np.abs(field).max() <= t.max_displacement  # basis is a convex combo


def test_build_transform_aug_flag(tiny_config):
    t_plain = build_transform(tiny_config, is_train=True)
    assert len(t_plain.transforms) == 1  # just ZNorm when aug=false
    tiny_config.aug = True
    t_aug = build_transform(tiny_config, is_train=True)
    assert len(t_aug.transforms) == 5


def test_patch_queue_shapes(tiny_config):
    ds = PatchQueueDataset(tiny_config)
    # 3 subjects * 4 samples / bs 2 = 6 batches
    assert len(ds) == 6
    batches = list(ds)
    assert len(batches) == 6
    x, y = batches[0]
    assert x.shape == (2, 16, 16, 16, 1)
    assert y.shape == (2, 16, 16, 16, 1)
    assert x.dtype == np.float32
    assert set(np.unique(y).tolist()) <= {0.0, 1.0}


def test_patch_queue_reproducible(tiny_config):
    a = list(PatchQueueDataset(tiny_config))
    b = list(PatchQueueDataset(tiny_config))
    np.testing.assert_array_equal(a[0][0], b[0][0])


def test_patch_queue_per_host_disjoint(tiny_config):
    """Multi-host: different process indices draw different patch streams
    (a real multi-host run must not train on duplicated data)."""
    h0 = list(PatchQueueDataset(tiny_config, process_index=0))
    h1 = list(PatchQueueDataset(tiny_config, process_index=1))
    assert len(h0) == len(h1)
    assert any(
        not np.array_equal(a[0], b[0]) for a, b in zip(h0, h1)
    ), "hosts 0 and 1 produced identical patch streams"


def test_patch_queue_producer_error_propagates(tiny_config):
    """A corrupt volume must fail the run, not silently truncate the epoch."""
    import pytest

    class _BoomTransform:
        def __call__(self, subject, rng):
            raise ValueError("corrupt volume")

    ds = PatchQueueDataset(tiny_config, transform=_BoomTransform())
    with pytest.raises(ValueError, match="corrupt volume"):
        list(ds)


def test_grid_locations_cover_volume():
    locs = grid_locations((32, 32, 32), (16, 16, 16), (4, 4, 4))
    cover = np.zeros((32, 32, 32), bool)
    for i0, j0, k0, i1, j1, k1 in locs:
        cover[i0:i1, j0:j1, k0:k1] = True
        assert i1 - i0 == 16 and j1 - j0 == 16 and k1 - k0 == 16
    assert cover.all()
    # steps of patch-overlap=12, clamped final start at 16
    starts = sorted(set(l[0] for l in locs))
    assert starts == [0, 12, 16]


def test_grid_aggregator_crop_mode_partitions():
    """Crop-mode aggregation of constant patches must reproduce a
    partition-of-unity write (TorchIO parity)."""
    shape = (24, 24, 24)
    patch = (16, 16, 16)
    overlap = (8, 8, 8)
    locs = grid_locations(shape, patch, overlap)
    agg = GridAggregator(shape, overlap, overlap_mode="crop", dtype=np.float32)
    # write patch index as the value; every voxel must be written exactly once
    for n, loc in enumerate(locs):
        patch_data = np.full((1,) + patch, float(n + 1), np.float32)
        agg.add_batch(patch_data[None], loc[None])
    out = agg.get_output_tensor()
    assert (out > 0).all()


def test_grid_aggregator_identity_reconstruction():
    """Aggregating crops of the source volume reconstructs it exactly
    (this is why gt-through-aggregator == gt in the reference)."""
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    locs = grid_locations(vol.shape[1:], patch, overlap)
    agg = GridAggregator(vol.shape[1:], overlap, overlap_mode="crop")
    for loc in locs:
        i0, j0, k0, i1, j1, k1 = loc
        agg.add_batch(vol[None, :, i0:i1, j0:j1, k0:k1], loc[None])
    np.testing.assert_array_equal(agg.get_output_tensor(), vol)


def test_grid_aggregator_average_mode():
    vol_shape = (20, 20, 20)
    patch, overlap = (12, 12, 12), (4, 4, 4)
    locs = grid_locations(vol_shape, patch, overlap)
    agg = GridAggregator(vol_shape, overlap, overlap_mode="average")
    for loc in locs:
        agg.add_batch(np.ones((1, 1) + patch, np.float32), loc[None])
    np.testing.assert_allclose(agg.get_output_tensor(), 1.0)


def test_rescale_intensity():
    from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
        RescaleIntensity,
    )

    s = _subject()
    out = RescaleIntensity((0.0, 1.0))(s, np.random.default_rng(0))
    assert out.source.data.min() >= 0.0 and out.source.data.max() <= 1.0
    assert abs(out.source.data.max() - 1.0) < 1e-6


def test_crop_or_pad():
    from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
        CropOrPad,
    )

    s = _subject(shape=(16, 16, 16))
    out = CropOrPad((12, 20, 16))(s, np.random.default_rng(0))
    assert out.source.spatial_shape == (12, 20, 16)
    assert out.gt.spatial_shape == (12, 20, 16)


def test_resample():
    from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
        Resample,
    )

    s = _subject(shape=(8, 8, 8))
    s.source.affine = np.diag([2.0, 2.0, 2.0, 1.0])
    s.gt.affine = np.diag([2.0, 2.0, 2.0, 1.0])
    out = Resample(1.0)(s, np.random.default_rng(0))
    assert out.source.spatial_shape == (16, 16, 16)
    assert tuple(round(v, 3) for v in out.source.spacing) == (1.0, 1.0, 1.0)
    assert set(np.unique(out.gt.data).tolist()) <= {0.0, 1.0}


def test_to_canonical():
    from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
        ToCanonical,
    )

    s = _subject(shape=(6, 8, 10))
    # LPS orientation: first two axes flipped
    s.source.affine = np.diag([-1.0, -1.0, 1.0, 1.0])
    s.gt.affine = s.source.affine.copy()
    src0 = s.source.data.copy()
    out = ToCanonical()(s, np.random.default_rng(0))
    rot = out.source.affine[:3, :3]
    assert np.all(np.diag(rot) > 0)  # RAS+ after reorient
    np.testing.assert_array_equal(out.source.data, src0[:, ::-1, ::-1, :])


def test_patch_queue_workers_deterministic(tiny_config):
    """num_workers must not change the patch stream: per-volume child RNGs
    + in-order consumption make the pool path byte-identical to serial."""
    import copy

    serial_cfg = copy.deepcopy(tiny_config)
    serial_cfg.num_workers = 1
    pool_cfg = copy.deepcopy(tiny_config)
    pool_cfg.num_workers = 3
    serial = list(PatchQueueDataset(serial_cfg))
    pooled = list(PatchQueueDataset(pool_cfg))
    assert len(serial) == len(pooled)
    for (xs, ys), (xp, yp) in zip(serial, pooled):
        np.testing.assert_array_equal(xs, xp)
        np.testing.assert_array_equal(ys, yp)
