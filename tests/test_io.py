"""Volume I/O round-trip tests (NIfTI + MHD), validated against torch-free
pure-numpy readers."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
    Volume,
    read_mhd,
    read_nifti,
    read_volume,
    write_mhd,
    write_nifti,
)


@pytest.fixture
def volume():
    rng = np.random.default_rng(42)
    data = rng.normal(size=(1, 8, 10, 12)).astype(np.float32)
    affine = np.array(
        [
            [1.0, 0, 0, -5.0],
            [0, 1.5, 0, 3.0],
            [0, 0, 2.0, -1.0],
            [0, 0, 0, 1.0],
        ]
    )
    return Volume(data, affine)


def test_nifti_roundtrip(tmp_path, volume):
    path = tmp_path / "vol.nii.gz"
    write_nifti(path, volume)
    back = read_nifti(path)
    np.testing.assert_allclose(back.data, volume.data, rtol=1e-6)
    np.testing.assert_allclose(back.affine, volume.affine, rtol=1e-5)


def test_nifti_uncompressed(tmp_path, volume):
    path = tmp_path / "vol.nii"
    write_nifti(path, volume)
    back = read_nifti(path)
    np.testing.assert_allclose(back.data, volume.data, rtol=1e-6)


def test_nifti_int_dtype(tmp_path):
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(1, 2, 3, 4)
    path = tmp_path / "mask.nii.gz"
    write_nifti(path, Volume(data))
    back = read_nifti(path)
    assert back.data.dtype == np.int16
    np.testing.assert_array_equal(back.data, data)


def test_mhd_roundtrip_compressed(tmp_path, volume):
    path = tmp_path / "vol.mhd"
    write_mhd(path, volume, compressed=True)
    assert (tmp_path / "vol.zraw").exists()
    back = read_mhd(path)
    np.testing.assert_allclose(back.data, volume.data, rtol=1e-6)
    np.testing.assert_allclose(back.affine, volume.affine, rtol=1e-5)


def test_mhd_roundtrip_raw(tmp_path, volume):
    path = tmp_path / "vol.mhd"
    write_mhd(path, volume, compressed=False)
    assert (tmp_path / "vol.raw").exists()
    back = read_mhd(path)
    np.testing.assert_allclose(back.data, volume.data, rtol=1e-6)


def test_mhd_roundtrip_multichannel(tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import Volume

    rng = np.random.default_rng(7)
    data = rng.normal(size=(3, 5, 6, 7)).astype(np.float32)  # [C, X, Y, Z]
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    path = tmp_path / "mc.mhd"
    write_mhd(path, Volume(data, affine), compressed=True)
    back = read_mhd(path)
    assert back.data.shape == data.shape
    np.testing.assert_allclose(back.data, data, rtol=1e-6)
    np.testing.assert_allclose(back.affine, affine, rtol=1e-5)


def test_spacing_from_affine(volume):
    assert volume.spacing == (1.0, 1.5, 2.0)


def test_read_volume_dispatch(tmp_path, volume):
    write_nifti(tmp_path / "a.nii.gz", volume)
    write_mhd(tmp_path / "a.mhd", volume)
    assert read_volume(tmp_path / "a.nii.gz").data.shape == volume.data.shape
    assert read_volume(tmp_path / "a.mhd").data.shape == volume.data.shape
    with pytest.raises(ValueError):
        read_volume(tmp_path / "a.xyz")


def test_fortran_order_matches_nibabel_convention(tmp_path):
    """First axis must be fastest-varying on disk (NIfTI spec)."""
    data = np.zeros((1, 2, 2, 2), dtype=np.float32)
    data[0, 1, 0, 0] = 7.0  # neighbor in x -> second element on disk
    path = tmp_path / "f.nii"
    write_nifti(path, Volume(data))
    raw = path.read_bytes()
    vals = np.frombuffer(raw[352:], dtype=np.float32)
    assert vals[1] == 7.0
