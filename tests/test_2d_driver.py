"""2-D driver path: slice patches through the unet2d network end-to-end.

The reference's 2-D zoo is unreachable from its drivers (SURVEY §2.4);
here ``config.network=unet2d`` with ``patch_size '1, H, W'`` trains and
predicts through the same CLI surface.
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def config_2d(synthetic_dataset, tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.config import compose

    return compose(
        [
            "config=unet2d",
            f"config.data_path={synthetic_dataset}/train/source",
            f"config.gt_path={synthetic_dataset}/train/label",
            f"config.pred_data_path={synthetic_dataset}/test/source",
            f"config.pred_gt_path={synthetic_dataset}/test/label",
            f"config.output_dir={tmp_path}/logs",
            "config.patch_size=1, 32, 32",
            "config.batch_size=2",
            "config.epochs=1",
            "config.samples_per_volume=4",
            "config.precision=float32",
            "config.patch_overlap=0, 8, 8",
        ],
        job_name="train",
    )


def test_2d_train_and_predict(config_2d):
    from general_medical_image_segmentation_cnn_framework_tpu.predict import predict
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    result = train(config_2d)
    assert np.isfinite(result["loss"])

    config_2d.job_name = "predict"
    config_2d.ckpt = os.path.join(
        config_2d.hydra_path, config_2d.latest_checkpoint_file
    )
    metrics = predict(config=config_2d)
    assert len(metrics["dice"]) == 2
