"""Offline tool tests: trans2nii, rename_files, gaussian filters, chunked get."""

import numpy as np

from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
    Volume,
    read_nifti,
    write_mhd,
)
from general_medical_image_segmentation_cnn_framework_tpu.utils.filters import (
    gaussian_high_pass,
    gaussian_low_pass,
)
from general_medical_image_segmentation_cnn_framework_tpu.utils.rename_files import (
    rename_predictions,
)
from general_medical_image_segmentation_cnn_framework_tpu.utils.trans2nii import (
    convert_mhd_to_nii,
)
from general_medical_image_segmentation_cnn_framework_tpu.utils.transfer import (
    chunked_device_get,
)

import pytest

pytestmark = pytest.mark.quick


def test_trans2nii(tmp_path):
    rng = np.random.default_rng(0)
    vol = Volume(rng.normal(size=(1, 6, 7, 8)).astype(np.float32))
    write_mhd(tmp_path / "a.mhd", vol)
    write_mhd(tmp_path / "b.mhd", vol)
    out = tmp_path / "out"
    assert convert_mhd_to_nii(tmp_path, out) == 2
    back = read_nifti(out / "a.nii.gz")
    np.testing.assert_allclose(back.data, vol.data, rtol=1e-6)


def test_rename_files(tmp_path):
    for i in range(3):
        (tmp_path / f"pred-{i:04d}.nii.gz").touch()
    (tmp_path / "metrics.csv").touch()
    assert rename_predictions(tmp_path, offset=1) == 3
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["1.nii.gz", "2.nii.gz", "3.nii.gz", "metrics.csv"]


def test_gaussian_filters_decompose():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(16, 16, 16)).astype(np.float32)
    low = gaussian_low_pass(img, sigma=2.0)
    high = gaussian_high_pass(img, sigma=2.0)
    np.testing.assert_allclose(low + high, img, atol=1e-4)
    # low pass reduces variance of high frequencies
    assert low.std() < img.std()


def test_chunked_device_get_roundtrip():
    import jax.numpy as jnp

    tree = {
        "small": jnp.arange(10.0),
        "big": jnp.arange(3 * 1024 * 1024, dtype=jnp.float32),  # 12MB
    }
    out = chunked_device_get(tree, chunk_bytes=1024 * 1024)
    np.testing.assert_array_equal(out["small"], np.arange(10.0))
    np.testing.assert_array_equal(
        out["big"], np.arange(3 * 1024 * 1024, dtype=np.float32)
    )
