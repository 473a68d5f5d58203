"""Validation-during-training + best-checkpoint tracking."""

from pathlib import Path

import numpy as np


def test_train_with_validation(tiny_config, synthetic_dataset):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.val_data_path = f"{synthetic_dataset}/test/source"
    tiny_config.val_gt_path = f"{synthetic_dataset}/test/label"
    tiny_config.val_interval = 1
    tiny_config.epochs = 2
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    run_dir = Path(tiny_config.hydra_path)
    assert (run_dir / "best_checkpoint.ckpt").exists()
    log = (run_dir / "train.log").read_text()
    assert "validation dice" in log
