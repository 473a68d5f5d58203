"""Device-side patch sampling backend (crop+normalize on device)."""

import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.data.device_prep import (
    DevicePatchDataset,
)


def test_device_batches(tiny_config):
    ds = DevicePatchDataset(tiny_config)
    assert len(ds) == 6
    batches = list(ds)
    assert len(batches) == 6
    x, y = batches[0]
    assert x.shape == (2, 16, 16, 16, 1)
    assert y.shape == (2, 16, 16, 16, 1)
    # znorm happened on device: per-volume standardized
    assert abs(float(np.mean(np.asarray(batches[0][0])))) < 2.0
    vals = set(np.unique(np.asarray(y)).tolist())
    assert vals <= {0.0, 1.0}


def test_device_backend_augments_on_device(tiny_config):
    """aug=true: volumes stored RAW, augmentation + patch gather fused on
    device; batches are znormed (mean ~0 after the device znorm) and
    labels stay binary; epochs differ (fresh augmentation per epoch)."""
    tiny_config.aug = True
    ds = DevicePatchDataset(tiny_config)
    # raw storage: the stored source is NOT znormalized
    src0 = np.asarray(ds.volumes[0][0])
    assert abs(float(src0.mean())) > 1e-3 or float(src0.std()) != 1.0
    e1 = list(ds)
    e2 = list(ds)
    assert len(e1) == len(ds)
    x, y = e1[0]
    assert x.shape == (2, 16, 16, 16, 1)
    assert set(np.unique(np.asarray(y)).tolist()) <= {0.0, 1.0}
    assert np.all(np.isfinite(np.asarray(x)))
    assert not np.array_equal(np.asarray(e1[0][0]), np.asarray(e2[0][0]))


def test_train_with_device_backend_aug(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "device"
    tiny_config.aug = True
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0


def test_train_with_device_backend(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "device"
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0


def test_device_backend_budget_fallback(tiny_config):
    """Datasets over config.device_dataset_gb must not be forced HBM-
    resident: DevicePatchDataset raises before any transfer, and
    make_dataset falls back to the threaded backend with a warning."""
    from general_medical_image_segmentation_cnn_framework_tpu.data.device_prep import (
        DeviceDatasetBudgetError,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.data.grain_pipeline import (
        make_dataset,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.data.pipeline import (
        PatchQueueDataset,
    )

    tiny_config.data_backend = "device"
    tiny_config.device_dataset_gb = 1e-9  # force over-budget
    with pytest.raises(DeviceDatasetBudgetError):
        DevicePatchDataset(tiny_config)
    ds = make_dataset(tiny_config, is_train=True)
    assert isinstance(ds, PatchQueueDataset)
    # default budget admits the tiny dataset
    tiny_config.device_dataset_gb = 8.0
    assert isinstance(make_dataset(tiny_config), DevicePatchDataset)
