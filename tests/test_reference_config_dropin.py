"""Drop-in acceptance of the reference's VERBATIM Hydra YAMLs.

A user of the reference should be able to point this framework at their
existing ``conf/`` tree unchanged. This composes the reference's actual
``conf/config.yaml`` + ``conf/config/unet.yaml`` files (read from the
read-only snapshot at test time — torch-era keys like ``cudnn_enabled``,
``cudnn_benchmark`` and ``gpu`` included, reference conf/config.yaml:9-36,
conf/config/unet.yaml:1-15) and runs one training epoch: unknown keys must
be accepted-and-ignored, known keys must take effect.
"""

import shutil
from pathlib import Path

import pytest

REF_CONF = Path("/root/reference/conf")

pytestmark = pytest.mark.skipif(
    not REF_CONF.exists(), reason="reference snapshot not available"
)


@pytest.fixture()
def reference_conf_dir(tmp_path):
    """Verbatim copy of the reference conf tree into a composable dir."""
    conf = tmp_path / "conf"
    (conf / "config").mkdir(parents=True)
    shutil.copyfile(REF_CONF / "config.yaml", conf / "config.yaml")
    shutil.copyfile(REF_CONF / "config" / "unet.yaml", conf / "config" / "unet.yaml")
    return conf


def test_reference_yaml_composes_verbatim(reference_conf_dir, tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.config import compose

    cfg = compose(
        [f"config.output_dir={tmp_path}/logs"],
        config_dir=reference_conf_dir,
        make_run_dir=True,
    )
    # known keys survive composition with reference values
    assert cfg.network == "unet"
    assert cfg.in_classes == 1 and cfg.out_classes == 2
    assert tuple(cfg.patch_size) == (64, 64, 64)
    assert cfg.init_type == "kaiming"
    assert cfg.batch_size == 16 and cfg.epochs == 100
    assert cfg.scheduler_step_size == 20 and cfg.scheduler_gamma == 0.8
    # torch-era keys are accepted-and-ignored, not rejected
    assert cfg.cudnn_enabled is True
    assert cfg.cudnn_benchmark is True
    assert str(cfg.gpu) == "2"  # group file overrides the base "0,1"
    assert cfg.save_suffix == ".mhd"


def test_reference_yaml_trains_one_epoch(
    reference_conf_dir, synthetic_dataset, tmp_path
):
    from general_medical_image_segmentation_cnn_framework_tpu.config import compose
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    cfg = compose(
        [
            # reference-style CLI overrides on top of the verbatim YAMLs
            f"config.data_path={synthetic_dataset}/train/source",
            f"config.gt_path={synthetic_dataset}/train/label",
            f"config.pred_data_path={synthetic_dataset}/test/source",
            f"config.pred_gt_path={synthetic_dataset}/test/label",
            f"config.output_dir={tmp_path}/logs",
            "config.patch_size=16, 16, 16",
            "config.batch_size=2",
            "config.epochs=1",
            "config.samples_per_volume=4",
            "config.precision=float32",
            # no compilation_cache_dir override: conftest already set a
            # per-machine salted cache (cross-machine AOT reuse fails at load)
        ],
        config_dir=reference_conf_dir,
        make_run_dir=True,
    )
    result = train(cfg)
    assert result is not None
    ckpt = Path(cfg.hydra_path) / cfg.latest_checkpoint_file
    assert ckpt.exists() or ckpt.with_suffix(".msgpack").exists()
