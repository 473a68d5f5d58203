"""Config composition tests: Hydra-compatible surface
(reference conf/config.yaml + train.py:310-320 parsing)."""

import pytest

pytestmark = pytest.mark.quick

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
    # reference run dirs carry all three echo files (README.md:56-66)
    import yaml

    hydra_echo = yaml.safe_load((run_dir / ".hydra" / "hydra.yaml").read_text())
    assert hydra_echo["hydra"]["job"]["name"] == "train"
    assert hydra_echo["hydra"]["runtime"]["output_dir"] == cfg.hydra_path


# A verbatim-shaped reference config pair: the exact key surface of
# /root/reference/conf/config.yaml + conf/config/unet.yaml, including the
# CUDA-only keys (cudnn_enabled, cudnn_benchmark, gpu) that a TPU runtime
# has no use for — they must compose cleanly (accepted and ignored), so a
# user's existing reference YAMLs are drop-in.
_REFERENCE_BASE_YAML = """\
defaults:
  - _self_
  - config: unet

hydra:
  run:
    dir: ${config.output_dir}/${hydra:job.name}-${now:%Y-%m-%d}/${now:%H-%M-%S}

config:
  data_path: "/disk/cyq/midas/train/source"
  gt_path: "/disk/cyq/midas/train/label"
  pred_data_path: "/disk/cyq/midas/test/source"
  pred_gt_path: "/disk/cyq/midas/test/label"
  init_type: 'kaiming'
  aug: False
  epochs: 100
  epochs_per_checkpoint: 5
  batch_size: 16
  init_lr: 0.001
  scheduler_step_size: 20
  scheduler_gamma: 0.8
  cudnn_enabled: True
  cudnn_benchmark: True
  use_scheduler: True
  gpu: "0,1"

  job_name: ${hydra:job.name}
  hydra_path: ${hydra:runtime.output_dir}
"""

_REFERENCE_GROUP_YAML = """\
name: "unet"
network: "unet"
output_dir: './logs/${config.name}'
save_suffix: '.mhd'
in_classes: 1
out_classes: 2
load_mode: 0
ckpt: None
latest_checkpoint_file: 'latest_checkpoint.pt'
crop_or_pad_size: 64, 64, 64
patch_size: 64, 64, 64
gpu: "2"
"""


def test_verbatim_reference_yaml_composes(tmp_path):
    conf = tmp_path / "conf"
    (conf / "config").mkdir(parents=True)
    (conf / "config.yaml").write_text(_REFERENCE_BASE_YAML)
    (conf / "config" / "unet.yaml").write_text(_REFERENCE_GROUP_YAML)
    cfg = compose(
        [f"config.output_dir={tmp_path}/logs"],
        job_name="train",
        config_dir=conf,
        make_run_dir=False,
    )
    assert cfg.network == "unet"
    assert cfg.patch_size == (64, 64, 64)
    assert cfg.batch_size == 16
    # CUDA-only keys ride along harmlessly
    assert cfg.cudnn_enabled is True and cfg.cudnn_benchmark is True
    assert cfg.gpu == "2"  # group file wins, like Hydra's package merge


def test_unknown_group_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        compose(["config=nonexistent_model_xyz"], make_run_dir=False)
