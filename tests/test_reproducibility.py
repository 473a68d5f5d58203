"""Determinism: identical seed + config => identical training trajectory."""

import numpy as np

from general_medical_image_segmentation_cnn_framework_tpu.config import compose
from general_medical_image_segmentation_cnn_framework_tpu.train import train


def _cfg(synthetic_dataset, out_dir):
    return compose(
        [
            "config=unet",
            f"config.data_path={synthetic_dataset}/train/source",
            f"config.gt_path={synthetic_dataset}/train/label",
            f"config.output_dir={out_dir}",
            "config.patch_size=16, 16, 16",
            "config.batch_size=2",
            "config.epochs=1",
            "config.samples_per_volume=4",
            "config.precision=float32",
            "config.seed=7",
        ],
        job_name="train",
    )


def test_same_seed_same_loss(synthetic_dataset, tmp_path):
    r1 = train(_cfg(synthetic_dataset, tmp_path / "a"))
    r2 = train(_cfg(synthetic_dataset, tmp_path / "b"))
    assert r1["loss"] == r2["loss"]
    assert r1["dice"] == r2["dice"]


def test_different_seed_differs(synthetic_dataset, tmp_path):
    c1 = _cfg(synthetic_dataset, tmp_path / "a")
    r1 = train(c1)
    c2 = _cfg(synthetic_dataset, tmp_path / "b")
    c2.seed = 8
    r2 = train(c2)
    assert r1["loss"] != r2["loss"]
