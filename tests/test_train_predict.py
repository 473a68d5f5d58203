"""End-to-end smoke + behavior tests: train loop, checkpointing/resume,
sliding-window predict, metrics CSV. Runs on the 8-device fake CPU mesh."""

import os
from pathlib import Path

import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from general_medical_image_segmentation_cnn_framework_tpu.train import (
    step_lr,
    train,
)


def test_step_lr_schedule():
    # StepLR(step_size=20, gamma=0.8): epochs 0-19 -> lr, 20-39 -> 0.8*lr
    assert step_lr(0.001, 20, 0.8, 0) == 0.001
    assert step_lr(0.001, 20, 0.8, 19) == 0.001
    assert abs(step_lr(0.001, 20, 0.8, 20) - 0.0008) < 1e-12
    assert abs(step_lr(0.001, 20, 0.8, 40) - 0.00064) < 1e-12


def test_train_one_epoch_and_checkpoints(tiny_config):
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0
    run_dir = Path(tiny_config.hydra_path)
    assert (run_dir / tiny_config.latest_checkpoint_file).exists()
    assert (run_dir / f"{tiny_config.job_name}.log").exists()


def test_train_loss_decreases(tiny_config):
    tiny_config.epochs = 3
    tiny_config.init_lr = 0.01
    result = train(tiny_config)
    # after 3 epochs on the easy synthetic ball task, dice should be real
    assert result["loss"] < 0.7


def test_resume_from_checkpoint(tiny_config):
    train(tiny_config)  # epoch 1
    tiny_config.load_mode = 1
    tiny_config.epochs = 2
    tiny_config.ckpt = os.path.join(
        tiny_config.hydra_path, tiny_config.latest_checkpoint_file
    )
    result = train(tiny_config)
    assert result["epoch"] == 2


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    stats = {"bn": {"mean": jnp.ones(3)}}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    path = tmp_path / "ckpt.msgpack"
    save_checkpoint(path, params, stats, opt_state, epoch=7)
    restored = load_checkpoint(
        path, {"params": params, "batch_stats": stats, "opt_state": opt_state, "epoch": 0}
    )
    assert restored["epoch"] == 7
    np.testing.assert_array_equal(restored["params"]["w"], np.arange(6.0).reshape(2, 3))
    # opt_state structure round-trips (NamedTuple skeleton preserved)
    assert type(restored["opt_state"]) is type(opt_state)


def test_predict_end_to_end(tiny_config, tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.predict import predict

    tiny_config.epochs = 2
    tiny_config.init_lr = 0.01
    train(tiny_config)

    tiny_config.job_name = "predict"
    tiny_config.ckpt = os.path.join(
        tiny_config.hydra_path, tiny_config.latest_checkpoint_file
    )
    results = predict(config=tiny_config)
    assert len(results["dice"]) == 2  # two test volumes
    run_dir = Path(tiny_config.hydra_path)
    assert (run_dir / "metrics.csv").exists()
    preds = sorted((run_dir / "pred_file").glob("pred-*.nii.gz"))
    assert len(preds) == 2

    # csv has 5 columns and a mean row
    import pandas as pd

    df = pd.read_csv(run_dir / "metrics.csv")
    assert list(df.columns) == ["precision", "recall", "jaccard", "dice", "hs95"]
    assert len(df) == 3  # 2 volumes + mean

    # written masks are binary and readable
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import read_volume

    mask = read_volume(preds[0])
    assert mask.spatial_shape == (32, 32, 32)
    assert set(np.unique(mask.data).tolist()) <= {0.0, 1.0}


def test_predict_shape_bucketing(tiny_config):
    """config.shape_bucket pads volumes to a common multiple (one compiled
    program across heterogeneous shapes) and crops the mask back."""
    from general_medical_image_segmentation_cnn_framework_tpu.predict import predict

    tiny_config.epochs = 2
    tiny_config.init_lr = 0.01
    train(tiny_config)
    tiny_config.job_name = "predict"
    tiny_config.ckpt = os.path.join(
        tiny_config.hydra_path, tiny_config.latest_checkpoint_file
    )
    tiny_config.shape_bucket = 24  # 32^3 volumes pad to 48^3 internally
    results = predict(config=tiny_config)
    assert len(results["dice"]) == 2
    run_dir = Path(tiny_config.hydra_path)
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import read_volume

    mask = read_volume(sorted((run_dir / "pred_file").glob("pred-*.nii.gz"))[0])
    assert mask.spatial_shape == (32, 32, 32)  # cropped back to the original


def test_predict_whole_volume_mode(tiny_config):
    """config.whole_volume=true: single-shot full-volume inference (no
    tiling) through the predict driver."""
    from general_medical_image_segmentation_cnn_framework_tpu.predict import predict

    tiny_config.epochs = 2
    tiny_config.init_lr = 0.01
    train(tiny_config)
    tiny_config.job_name = "predict"
    tiny_config.ckpt = os.path.join(
        tiny_config.hydra_path, tiny_config.latest_checkpoint_file
    )
    tiny_config.whole_volume = True
    results = predict(config=tiny_config)
    assert len(results["dice"]) == 2
    run_dir = Path(tiny_config.hydra_path)
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import read_volume

    mask = read_volume(sorted((run_dir / "pred_file").glob("pred-*.nii.gz"))[0])
    assert mask.spatial_shape == (32, 32, 32)
    assert set(np.unique(mask.data).tolist()) <= {0.0, 1.0}


def test_predict_mhd_output(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.predict import predict

    train(tiny_config)
    tiny_config.job_name = "predict"
    tiny_config.save_suffix = ".mhd"
    tiny_config.ckpt = os.path.join(
        tiny_config.hydra_path, tiny_config.latest_checkpoint_file
    )
    predict(config=tiny_config)
    run_dir = Path(tiny_config.hydra_path)
    assert (run_dir / "pred_file" / "pred-0000.mhd").exists()
    assert (run_dir / "pred_file" / "pred-0000.zraw").exists()
