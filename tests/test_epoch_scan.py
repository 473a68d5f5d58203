"""Whole-epoch lax.scan training path (epoch_scan + device backend)."""

import numpy as np
import pytest


def test_epoch_plan():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.epoch_scan import (
        build_epoch_plan,
    )

    rng = np.random.default_rng(0)
    vol_idx, origins = build_epoch_plan(3, 4, 2, (32, 32, 32), (16, 16, 16), rng)
    assert vol_idx.shape == (6, 2)
    assert origins.shape == (6, 2, 3)
    assert origins.min() >= 0 and origins.max() <= 16
    # every volume sampled samples_per_volume times
    counts = np.bincount(vol_idx.ravel(), minlength=3)
    assert (counts == 4).all()


def test_train_with_epoch_scan(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    tiny_config.epochs = 2
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0


def test_epoch_scan_requires_device_backend(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.epoch_scan = True  # threaded backend -> assertion
    with pytest.raises(AssertionError):
        train(tiny_config)
