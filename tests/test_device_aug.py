"""On-device augmentation (data/device_aug.py) vs the host scipy pipeline.

Each device transform is checked against its data/transforms.py
counterpart with IDENTICAL parameters — only the RNG stream is allowed
to differ between the two paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick
from scipy import ndimage

from general_medical_image_segmentation_cnn_framework_tpu.data import device_aug as da
from general_medical_image_segmentation_cnn_framework_tpu.data import transforms as ht


@pytest.fixture()
def pair():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1, 12, 13, 14)).astype(np.float32)
    gt = (rng.uniform(size=(1, 12, 13, 14)) > 0.6).astype(np.float32)
    return src, gt


def test_bias_field_matches_host_einsum(pair):
    src, _ = pair
    shape = src.shape[1:]
    rng = np.random.default_rng(3)
    o = 4
    coeffs = np.zeros((o, o, o), dtype=np.float32)
    for a in range(o):
        for b in range(o - a):
            for c in range(o - a - b):
                coeffs[a, b, c] = rng.uniform(-0.5, 0.5)
    got = np.asarray(da.bias_field_from_coeffs(jnp.asarray(coeffs), shape))
    # brute-force monomial oracle
    ranges = [np.linspace(-1.0, 1.0, s, dtype=np.float64) for s in shape]
    x, y, z = np.meshgrid(*ranges, indexing="ij")
    want = np.zeros(shape)
    for a in range(o):
        for b in range(o):
            for c in range(o):
                want += coeffs[a, b, c] * x**a * y**b * z**c
    want = np.exp(want)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_znormalize_matches_host(pair):
    src, _ = pair
    got = np.asarray(da.znormalize(jnp.asarray(src)))
    want = ht.ZNormalization().normalize_array(src)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_affine_matrix_matches_host():
    scales = np.array([0.95, 1.05, 1.02])
    degrees = np.array([7.0, -4.0, 2.5])
    translation = np.array([0.5, -1.0, 0.0])
    center = np.array([5.5, 6.0, 6.5])
    got = np.asarray(
        da.affine_matrix(
            jnp.asarray(scales), jnp.asarray(degrees),
            jnp.asarray(translation), jnp.asarray(center),
        )
    )
    want = ht._affine_matrix(scales, degrees, translation, center)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_affine_resample_matches_scipy(pair):
    src, gt = pair
    M = ht._affine_matrix(
        np.array([0.95, 1.05, 1.0]), np.array([8.0, -5.0, 3.0]),
        np.array([0.0, 0.0, 0.0]),
        (np.asarray(src.shape[1:], dtype=np.float64) - 1) / 2.0,
    )
    got_src, got_gt = da.affine_resample_pair(
        jnp.asarray(src), jnp.asarray(gt), jnp.asarray(M)
    )
    Minv = np.linalg.inv(M)
    pad = float(src.min())
    want_src = ndimage.affine_transform(
        src[0], Minv[:3, :3], offset=Minv[:3, 3], order=1,
        mode="constant", cval=pad,
    )
    want_gt = ndimage.affine_transform(
        gt[0], Minv[:3, :3], offset=Minv[:3, 3], order=0,
        mode="constant", cval=0.0,
    )
    np.testing.assert_allclose(np.asarray(got_src)[0], want_src, rtol=1e-4, atol=1e-4)
    # nearest-neighbour ties at exact .5 fractional coordinates may round
    # differently between scipy's spline-order-0 and jax's round; the label
    # must agree on a dominant majority of voxels and stay binary
    agree = np.mean(np.asarray(got_gt)[0] == want_gt)
    assert agree > 0.995, f"label agreement {agree}"
    assert set(np.unique(np.asarray(got_gt)).tolist()) <= {0.0, 1.0}


def test_elastic_displacement_matches_host():
    rng = np.random.default_rng(5)
    n = 7
    grid = rng.uniform(-7.5, 7.5, size=(3, n, n, n))
    grid[:, :2] = grid[:, -2:] = 0
    grid[:, :, :2] = grid[:, :, -2:] = 0
    grid[:, :, :, :2] = grid[:, :, :, -2:] = 0
    shape = (12, 13, 14)
    got = np.asarray(da.elastic_displacement(jnp.asarray(grid), shape))
    want = ht.RandomElasticDeformation().displacement_field(grid, shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_elastic_resample_matches_scipy(pair):
    src, gt = pair
    rng = np.random.default_rng(6)
    n = 7
    grid = np.zeros((3, n, n, n))
    grid[:, 2:-2, 2:-2, 2:-2] = rng.uniform(-4.0, 4.0, size=(3, n - 4, n - 4, n - 4))
    got_src, got_gt = da.elastic_resample_pair(
        jnp.asarray(src), jnp.asarray(gt), jnp.asarray(grid)
    )
    shape = src.shape[1:]
    disp = ht.RandomElasticDeformation().displacement_field(grid, shape)
    coords = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in shape], indexing="ij")
    sample = [coords[i] + disp[i] for i in range(3)]
    want_src = ndimage.map_coordinates(src[0], sample, order=1, mode="nearest")
    want_gt = ndimage.map_coordinates(gt[0], sample, order=0, mode="nearest")
    np.testing.assert_allclose(np.asarray(got_src)[0], want_src, rtol=1e-4, atol=1e-4)
    agree = np.mean(np.asarray(got_gt)[0] == want_gt)
    assert agree > 0.995, f"label agreement {agree}"


def test_flip_pair():
    src = jnp.arange(24.0).reshape(1, 2, 3, 4)
    gt = (src > 11).astype(jnp.float32)
    # scan keys until both branches observed
    flipped = unflipped = False
    for i in range(20):
        s, g = da.random_flip_pair(jax.random.PRNGKey(i), src, gt)
        if np.array_equal(np.asarray(s), np.asarray(src)):
            unflipped = True
            np.testing.assert_array_equal(np.asarray(g), np.asarray(gt))
        else:
            flipped = True
            np.testing.assert_array_equal(np.asarray(s), np.asarray(src)[:, ::-1])
            np.testing.assert_array_equal(np.asarray(g), np.asarray(gt)[:, ::-1])
    assert flipped and unflipped


def test_augment_pair_jits_and_is_sane(pair):
    src, gt = pair
    fn = jax.jit(da.augment_pair)
    out_src, out_gt = fn(jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(gt))
    assert out_src.shape == src.shape and out_gt.shape == gt.shape
    assert np.all(np.isfinite(np.asarray(out_src)))
    assert set(np.unique(np.asarray(out_gt)).tolist()) <= {0.0, 1.0}
    # different keys -> different augmentations; same key -> identical
    a = fn(jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(gt))
    b = fn(jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(gt))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert not np.array_equal(np.asarray(a[0]), np.asarray(out_src))


def test_bspline_cache_safe_across_traces():
    """Regression: _bspline_bases is lru_cached and must cache numpy — a
    jnp value created during one jit trace poisons every later trace with
    an UnexpectedTracerError (observed order-dependently in the full
    suite, r3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from general_medical_image_segmentation_cnn_framework_tpu.data import device_aug

    device_aug._bspline_bases.cache_clear()
    src = jnp.zeros((1, 12, 12, 12))
    gt = jnp.zeros((1, 12, 12, 12))

    @jax.jit
    def first(k, s, g):
        return device_aug.random_elastic_pair(k, s, g)

    first(jax.random.PRNGKey(0), src, gt)  # populates the cache IN-TRACE
    for leaf in device_aug._bspline_bases((12, 12, 12), 7):
        assert isinstance(leaf, np.ndarray), type(leaf)

    @jax.jit  # a second, separate trace must not see a dead tracer
    def second(k, s, g):
        return device_aug.random_elastic_pair(k, s, g)

    out, _ = second(jax.random.PRNGKey(1), src, gt)
    assert np.all(np.isfinite(np.asarray(out)))
