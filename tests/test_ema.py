"""EMA of the params (config.ema_decay): shadow tree initialized from the
initial params, updated after every step, written as a normal-format
checkpoint that predict loads via config.ckpt unchanged."""

import os

import jax
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.checkpoint import (
    load_any_checkpoint,
)
from general_medical_image_segmentation_cnn_framework_tpu.train import train


def _compose(synthetic_dataset, tmp_path, *overrides):
    from general_medical_image_segmentation_cnn_framework_tpu.config import compose

    return compose(
        [
            "config=unet",
            f"config.data_path={synthetic_dataset}/train/source",
            f"config.gt_path={synthetic_dataset}/train/label",
            f"config.pred_data_path={synthetic_dataset}/test/source",
            f"config.pred_gt_path={synthetic_dataset}/test/label",
            f"config.output_dir={tmp_path}/logs",
            "config.patch_size=16, 16, 16",
            "config.batch_size=2",
            "config.epochs=1",
            "config.samples_per_volume=2",
            "config.precision=float32",
            *overrides,
        ],
        job_name="train",
        make_run_dir=True,
    )


def test_ema_tracks_params_and_checkpoints(synthetic_dataset, tmp_path):
    """One epoch == 3 steps at these settings; the EMA after k steps is
    sum_i w_i params_i with the exponential weights anchored at the INITIAL
    params — verify against a host-side replay of the returned trajectory
    is impractical (params are donated), so pin the two provable facts:
    the EMA differs from the final params, lies within the convex hull of
    the trajectory (decay < 1), and the ema_checkpoint.ckpt round-trips."""
    cfg = _compose(
        synthetic_dataset, tmp_path, "config.ema_decay=0.9",
        "config.epochs_per_checkpoint=1",
    )
    result = train(cfg)
    assert result["ema_params"] is not None
    p = jax.tree_util.tree_leaves(result["params"])
    e = jax.tree_util.tree_leaves(result["ema_params"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p, e)
    ), "EMA must lag the raw params after a few steps"

    path = os.path.join(cfg.hydra_path, "ema_checkpoint.ckpt")
    assert os.path.exists(path)
    # predict's template: params/batch_stats only — ema_checkpoint.ckpt
    # deliberately stores NO opt_state (the raw run's Adam moments belong
    # to the raw trajectory and would double the file; ADVICE r4)
    template = {
        "params": result["params"],
        "batch_stats": result["batch_stats"],
        "epoch": 0,
    }
    restored = load_any_checkpoint(path, template)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["params"]),
        jax.tree_util.tree_leaves(result["ema_params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_any_checkpoint(path)["opt_state"] == {}


def test_ema_exact_one_step(synthetic_dataset, tmp_path):
    """With exactly ONE optimizer step, ema == d*params0 + (1-d)*params1 —
    checkable because params0 is re-derivable from the seed."""
    from general_medical_image_segmentation_cnn_framework_tpu.models import (
        build_model,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
    )

    cfg = _compose(
        synthetic_dataset, tmp_path, "config.ema_decay=0.5",
        "config.samples_per_volume=1", "config.batch_size=3",
        "config.num_workers=1", "config.data_backend=threaded",
    )
    model = build_model(cfg)
    params0, _, _, _ = init_train_state(model=model, config=cfg, rng=jax.random.PRNGKey(0))
    result = train(cfg, model=model)
    for a0, a1, ae in zip(
        jax.tree_util.tree_leaves(params0),
        jax.tree_util.tree_leaves(result["params"]),
        jax.tree_util.tree_leaves(result["ema_params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(ae),
            0.5 * np.asarray(a0) + 0.5 * np.asarray(a1),
            rtol=1e-5, atol=1e-7,
        )


def test_ema_rejected_with_epoch_scan(synthetic_dataset, tmp_path):
    cfg = _compose(
        synthetic_dataset, tmp_path, "config.ema_decay=0.9",
        "config.epoch_scan=true", "config.data_backend=device",
    )
    with pytest.raises(ValueError, match="ema_decay"):
        train(cfg)


def test_ema_resume_recovers_history(synthetic_dataset, tmp_path):
    """load_mode=1 + ema_decay must reload ema_checkpoint.ckpt from the
    resume directory instead of silently re-seeding the EMA from the
    restored raw params (ADVICE r4). Resuming with the same epoch count
    runs zero new steps, so the resumed run's EMA tree must equal the
    first run's saved EMA exactly — without the fix it equals the raw
    params instead (which differ after 3 steps, per the first test)."""
    cfg = _compose(
        synthetic_dataset, tmp_path, "config.ema_decay=0.9",
        "config.epochs_per_checkpoint=1",
    )
    first = train(cfg)

    cfg2 = _compose(
        synthetic_dataset, tmp_path, "config.ema_decay=0.9",
        "config.load_mode=1",
        f"config.ckpt={os.path.join(cfg.hydra_path, cfg.latest_checkpoint_file)}",
    )
    resumed = train(cfg2)
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed["ema_params"]),
        jax.tree_util.tree_leaves(first["ema_params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
