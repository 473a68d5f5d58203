"""Orbax checkpoint backend: round-trip + driver resume via dispatch."""

import numpy as np
import pytest


def test_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    from general_medical_image_segmentation_cnn_framework_tpu.checkpoint import (
        load_any_checkpoint,
        save_checkpoint_orbax,
    )

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    stats = {"bn": {"mean": jnp.ones(3)}}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    path = tmp_path / "ckpt_orbax"
    save_checkpoint_orbax(path, params, stats, opt_state, epoch=3)
    assert path.is_dir()
    restored = load_any_checkpoint(
        path, {"params": params, "batch_stats": stats, "opt_state": opt_state, "epoch": 0}
    )
    assert restored["epoch"] == 3
    np.testing.assert_array_equal(
        restored["params"]["w"], np.arange(6.0).reshape(2, 3)
    )
    assert type(restored["opt_state"]) is type(opt_state)


def test_train_with_orbax_backend(tiny_config):
    import os

    from general_medical_image_segmentation_cnn_framework_tpu.train import train
    from pathlib import Path

    tiny_config.checkpoint_backend = "orbax"
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    latest = Path(tiny_config.hydra_path) / tiny_config.latest_checkpoint_file
    assert latest.is_dir()  # orbax writes a directory

    # resume from the orbax checkpoint
    tiny_config.load_mode = 1
    tiny_config.epochs = 2
    tiny_config.ckpt = str(latest)
    result = train(tiny_config)
    assert result["epoch"] == 2
