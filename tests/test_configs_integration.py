"""Every shipped config group must compose and build its model."""

from pathlib import Path

import pytest

from general_medical_image_segmentation_cnn_framework_tpu.config import compose
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs" / "config"
GROUPS = sorted(p.stem for p in CONFIG_DIR.glob("*.yaml"))


def test_all_model_configs_ship():
    assert len(GROUPS) == 23


@pytest.mark.parametrize("group", GROUPS)
def test_config_composes_and_builds(group, tmp_path):
    cfg = compose(
        [f"config={group}", f"config.output_dir={tmp_path}"], make_run_dir=False
    )
    assert cfg.network == group
    model = build_model(cfg)
    assert model is not None
