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


def test_device_backend_rejects_aug(tiny_config):
    tiny_config.aug = True
    with pytest.raises(ValueError):
        DevicePatchDataset(tiny_config)


def test_train_with_device_backend(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "device"
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0
