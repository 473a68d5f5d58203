"""Config composition tests: Hydra-compatible surface
(reference conf/config.yaml + train.py:310-320 parsing)."""

import pytest

from general_medical_image_segmentation_cnn_framework_tpu.config import (
    compose,
    parse_patch_size,
)


def test_patch_size_parsing():
    assert parse_patch_size("64, 64, 64") == (64, 64, 64)
    assert parse_patch_size("96") == (96, 96, 96)
    assert parse_patch_size(48) == (48, 48, 48)
    assert parse_patch_size([1, 2, 3]) == (1, 2, 3)
    with pytest.raises(AssertionError):
        parse_patch_size("1, 2, 3, 4")


def test_compose_defaults(tmp_path):
    cfg = compose(
        [f"config.output_dir={tmp_path}"], job_name="train", make_run_dir=False
    )
    assert cfg.network == "unet"
    assert cfg.patch_size == (64, 64, 64)
    assert cfg.in_classes == 1 and cfg.out_classes == 2
    assert cfg.job_name == "train"
    assert str(tmp_path) in cfg.hydra_path
    assert "train-" in cfg.hydra_path  # ${job.name}-${date}/${time} layout


def test_compose_overrides(tmp_path):
    cfg = compose(
        [
            f"config.output_dir={tmp_path}",
            "config.batch_size=4",
            "config.init_lr=0.01",
            "config.aug=true",
        ],
        make_run_dir=False,
    )
    assert cfg.batch_size == 4
    assert cfg.init_lr == 0.01
    assert cfg.aug is True


def test_run_dir_artifacts(tmp_path):
    cfg = compose([f"config.output_dir={tmp_path}"], make_run_dir=True)
    from pathlib import Path

    run_dir = Path(cfg.hydra_path)
    assert (run_dir / ".hydra" / "config.yaml").exists()
    assert (run_dir / ".hydra" / "overrides.yaml").exists()


def test_unknown_group_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        compose(["config=nonexistent_model_xyz"], make_run_dir=False)
