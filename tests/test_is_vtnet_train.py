"""End-to-end train steps for the special-path models: IS (FFT band-split
inputs, tuple output) and VT-UNet (dropout/drop-path rngs, attention)."""

import jax
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
from general_medical_image_segmentation_cnn_framework_tpu.train import (
    init_train_state,
    make_train_step,
)


def _cfg(network, patch, extra=None):
    base = {
        "network": network,
        "in_classes": 1,
        "out_classes": 2,
        "patch_size": (patch,) * 3,
        "init_lr": 1e-3,
        "init_type": "kaiming",
        "precision": "float32",
        "seed": 0,
    }
    base.update(extra or {})
    return ConfigDict(base)


def _one_step(config, model):
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    ps = config.patch_size
    x = np.random.default_rng(0).normal(size=(2, *ps, 1)).astype(np.float32)
    y = (np.random.default_rng(1).uniform(size=(2, *ps, 1)) > 0.5).astype(np.float32)
    params, stats, opt, loss, dice = step(params, stats, opt, x, y, rng)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(dice) <= 1.0


def test_is_train_step():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.is_net import ISNet

    config = _cfg("IS", 16)
    model = ISNet(init_features=4)
    _one_step(config, model)


def test_vtnet_train_step():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.vtnet import VTUNet

    # H/W must survive 3 patch-merges: patch 4 * 2^3 = 32 minimum (the
    # reference has the same constraint, hardcoded for 128^3)
    config = _cfg("vtnet", 32)
    model = VTUNet(
        num_classes=2, input_dim=1, embed_dim=12, win_size=2, img_size=(32, 32, 32)
    )
    _one_step(config, model)
