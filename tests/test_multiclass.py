"""Multi-class segmentation support (out_classes > 2 — capability
extension; the reference's binary one-hot construction cannot express it)."""

import os
from pathlib import Path

import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
    Volume,
    write_nifti,
)
from general_medical_image_segmentation_cnn_framework_tpu.metrics import (
    multiclass_seg_metrics,
)


@pytest.fixture(scope="module")
def multiclass_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mc_data")
    for split, count, off in (("train", 3, 0), ("test", 2, 100)):
        (root / split / "source").mkdir(parents=True)
        (root / split / "label").mkdir(parents=True)
        for i in range(count):
            r = np.random.default_rng(off + i)
            shape = (32, 32, 32)
            coords = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"))
            c1 = r.uniform(8, 12, 3)
            c2 = r.uniform(20, 24, 3)
            d1 = np.sqrt(((coords - c1[:, None, None, None]) ** 2).sum(0))
            d2 = np.sqrt(((coords - c2[:, None, None, None]) ** 2).sum(0))
            label = np.zeros(shape, np.float32)
            label[d1 < 6] = 1.0
            label[d2 < 6] = 2.0
            image = label * 1.5 + r.normal(0, 0.3, shape).astype(np.float32)
            write_nifti(root / split / "source" / f"v{i:02d}.nii.gz", Volume(image[None]))
            write_nifti(root / split / "label" / f"v{i:02d}.nii.gz", Volume(label[None]))
    return root


@pytest.fixture()
def mc_config(multiclass_dataset, tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.config import compose

    return compose(
        [
            "config=unet",
            f"config.data_path={multiclass_dataset}/train/source",
            f"config.gt_path={multiclass_dataset}/train/label",
            f"config.pred_data_path={multiclass_dataset}/test/source",
            f"config.pred_gt_path={multiclass_dataset}/test/label",
            f"config.output_dir={tmp_path}/logs",
            "config.out_classes=3",
            "config.patch_size=16, 16, 16",
            "config.batch_size=2",
            "config.epochs=1",
            "config.samples_per_volume=4",
            "config.precision=float32",
            "config.patch_overlap=4, 4, 4",
        ],
        job_name="train",
    )


def test_multiclass_metrics():
    gt = np.zeros((8, 8, 8), int)
    pred = np.zeros((8, 8, 8), int)
    gt[:4] = 1
    gt[4:] = 2
    pred[:4] = 1
    pred[4:] = 2
    j, d = multiclass_seg_metrics(gt, pred, 3)
    assert d > 0.999
    pred[:] = 0
    pred[:4] = 2  # everything wrong
    j, d = multiclass_seg_metrics(gt, pred, 3)
    assert d < 0.01


def test_multiclass_train_and_predict(mc_config):
    from general_medical_image_segmentation_cnn_framework_tpu.predict import predict
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    result = train(mc_config)
    assert np.isfinite(result["loss"])

    mc_config.job_name = "predict"
    mc_config.ckpt = os.path.join(mc_config.hydra_path, mc_config.latest_checkpoint_file)
    metrics = predict(config=mc_config)
    assert len(metrics["dice"]) == 2
    # written masks may contain class ids up to 2
    run_dir = Path(mc_config.hydra_path)
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import read_volume

    mask = read_volume(sorted((run_dir / "pred_file").glob("*.nii.gz"))[0])
    assert set(np.unique(mask.data).tolist()) <= {0.0, 1.0, 2.0}


def test_multiclass_epoch_scan(mc_config):
    """The whole-epoch scan shares make_loss_and_metric with the per-step
    loop, so multiclass CE trains through it too (the r2 scan was
    BCE-only)."""
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    Path(mc_config.output_dir).mkdir(parents=True, exist_ok=True)
    mc_config.hydra_path = mc_config.output_dir
    mc_config.data_backend = "device"
    mc_config.epoch_scan = True
    result = train(mc_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0
