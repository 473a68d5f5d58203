"""Grain-backed pipeline: same shapes/semantics as the threaded queue."""

import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.data.grain_pipeline import (
    GrainPatchDataset,
    make_dataset,
)
from general_medical_image_segmentation_cnn_framework_tpu.data.pipeline import (
    PatchQueueDataset,
)


def test_grain_batches(tiny_config):
    ds = GrainPatchDataset(tiny_config)
    assert len(ds) == 6  # 3 subjects * 4 samples / bs 2
    batches = list(ds)
    assert len(batches) == 6
    x, y = batches[0]
    assert x.shape == (2, 16, 16, 16, 1)
    assert y.shape == (2, 16, 16, 16, 1)
    assert x.dtype == np.float32
    assert set(np.unique(y).tolist()) <= {0.0, 1.0}
    # znorm applied per volume: patches roughly standardized
    assert abs(float(np.mean([b[0].mean() for b in batches]))) < 1.0


def test_grain_reshuffles_across_epochs(tiny_config):
    ds = GrainPatchDataset(tiny_config)
    a = list(ds)
    b = list(ds)
    assert len(a) == len(b)
    assert not all(np.array_equal(x1, x2) for (x1, _), (x2, _) in zip(a, b))


def test_make_dataset_backend_switch(tiny_config):
    # device is the DEFAULT backend since r5 (2.6x host aug on HW)
    from general_medical_image_segmentation_cnn_framework_tpu.data.device_prep import (
        DevicePatchDataset,
    )

    assert isinstance(make_dataset(tiny_config), DevicePatchDataset)
    tiny_config.data_backend = "threaded"
    assert isinstance(make_dataset(tiny_config), PatchQueueDataset)
    tiny_config.data_backend = "grain"
    assert isinstance(make_dataset(tiny_config), GrainPatchDataset)


def test_train_with_grain_backend(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "grain"
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
