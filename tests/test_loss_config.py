"""Configurable training criterion (config.loss)."""

import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.train import (
    make_loss_fn,
    train,
)


def test_make_loss_fn_variants(tiny_config):
    import jax.numpy as jnp

    logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 4, 2)), jnp.float32)
    target = jnp.asarray((np.random.default_rng(1).uniform(size=(1, 4, 4, 4, 2)) > 0.5), jnp.float32)
    for name in ("bce", "dice", "focal", "bce+dice"):
        tiny_config.loss = name
        val = float(make_loss_fn(tiny_config)(logits, target))
        assert np.isfinite(val), name

    tiny_config.loss = "nope"
    with pytest.raises(KeyError):
        make_loss_fn(tiny_config)


def test_train_with_dice_loss(tiny_config):
    tiny_config.loss = "bce+dice"
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
