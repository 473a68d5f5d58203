"""Observability: profiler trace hook, debug-nans flag, metrics logger."""

import os
from pathlib import Path

import numpy as np
import pytest


def test_profile_dir_writes_trace(tiny_config, tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.profile_dir = str(tmp_path / "trace")
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    trace_files = list(Path(tiny_config.profile_dir).rglob("*"))
    assert trace_files, "profiler trace dir is empty"


def test_metrics_logger(tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.logging_utils import (
        MetricsLogger,
    )

    ml = MetricsLogger(str(tmp_path))
    ml.log(1, "loss", 0.5)
    ml.log(2, "loss", 0.25)
    lines = (tmp_path / "train_metrics.csv").read_text().strip().splitlines()
    assert lines[0] == "step,name,value"
    assert len(lines) == 3


def test_rank_logger(tmp_path):
    from general_medical_image_segmentation_cnn_framework_tpu.logging_utils import (
        get_rank_logger,
    )

    log = get_rank_logger("job", rank=1, log_dir=str(tmp_path))
    log.debug("hidden from console, present in file")
    assert (tmp_path / "job.rank1.log").exists()
