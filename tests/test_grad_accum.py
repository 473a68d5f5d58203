"""Gradient accumulation (config.grad_accum) + configurable optimizer.

The reference's only lever when a batch doesn't fit is shrinking the
host-side patches (dataloader.py:65-67); grad_accum instead scans A
microbatches per optimizer step so only one microbatch's activations are
live. Equivalence: for mean-reduced criteria and batch-independent norms
(InstanceNorm — res_unet), mean-of-microbatch-grads == full-batch grad,
so one accumulated SGD step must match one full-batch SGD step.
(SGD, not Adam: Adam amplifies float reassociation noise on ~1e-9 bias
grads into ±lr random walks — CLAUDE.md r4.)
"""

import jax
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
    train,
)
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model


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
            "config.batch_size=4",
            "config.epochs=1",
            "config.samples_per_volume=4",
            "config.precision=float32",
            *overrides,
        ],
        job_name="train",
        make_run_dir=True,
    )


def _clone(tree):
    return jax.tree_util.tree_map(lambda a: np.array(a), tree)


def _run_one_step(config, params, batch_stats, opt_state, tx, x, gt, model=None):
    if model is None:
        model = build_model(config)
    step = make_train_step(config, model, tx)
    rng = jax.random.PRNGKey(7)
    return step(_clone(params), _clone(batch_stats), _clone(opt_state), x, gt, rng)


class _MLP:
    """Dropout-free, norm-free per-voxel net: microbatch grads are exactly
    decomposable, so accumulated SGD must equal full-batch SGD. Built lazily
    (flax import inside) and driven through the REAL make_train_step."""

    def __new__(cls):
        import flax.linen as nn

        class MLP(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                y = nn.Dense(8)(x)
                y = nn.relu(y)
                return nn.Dense(2)(y)

        return MLP()


@pytest.mark.quick
def test_grad_accum_matches_full_batch(synthetic_dataset, tmp_path):
    cfg = _compose(
        synthetic_dataset, tmp_path, "config.optimizer=sgd",
        "config.init_lr=0.05",
    )
    model = _MLP()
    params, batch_stats, opt_state, tx = init_train_state(
        cfg, model, jax.random.PRNGKey(0)
    )
    assert not batch_stats  # no running stats in the toy net
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 16, 16, 16, 1)).astype(np.float32)
    gt = (rng.uniform(size=(4, 16, 16, 16, 1)) > 0.5).astype(np.float32)

    p_full, _, _, loss_full, dice_full = _run_one_step(
        cfg, params, batch_stats, opt_state, tx, x, gt, model=model
    )
    cfg.grad_accum = 2
    p_acc, _, _, loss_acc, dice_acc = _run_one_step(
        cfg, params, batch_stats, opt_state, tx, x, gt, model=model
    )

    np.testing.assert_allclose(float(loss_full), float(loss_acc), rtol=2e-5)
    # the dice metric is a mean of per-sample dices, so microbatch-mean ==
    # batch-mean up to f32 reduction reassociation (~5e-5 measured)
    np.testing.assert_allclose(float(dice_full), float(dice_acc), rtol=5e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_full), jax.tree_util.tree_leaves(p_acc)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_grad_accum_bn_train_smoke(synthetic_dataset, tmp_path):
    """unet (BatchNorm): accumulation runs end-to-end through train();
    running stats update per microbatch (semantics of A smaller steps)."""
    cfg = _compose(
        synthetic_dataset, tmp_path, "config.grad_accum=2",
        "config.batch_size=2",
    )
    result = train(cfg)
    assert np.isfinite(result["loss"])
    assert result["batch_stats"]  # BN stats updated through the scan


def test_grad_accum_must_divide_batch(synthetic_dataset, tmp_path):
    cfg = _compose(
        synthetic_dataset, tmp_path, "config.grad_accum=3",
        "config.batch_size=4",
    )
    model = build_model(cfg)
    params, batch_stats, opt_state, tx = init_train_state(
        cfg, model, jax.random.PRNGKey(0)
    )
    x = np.zeros((4, 16, 16, 16, 1), np.float32)
    gt = np.zeros((4, 16, 16, 16, 1), np.float32)
    with pytest.raises(AssertionError, match="grad_accum"):
        _run_one_step(cfg, params, batch_stats, opt_state, tx, x, gt)


def test_grad_accum_epoch_scan_rejected(synthetic_dataset, tmp_path):
    cfg = _compose(
        synthetic_dataset, tmp_path, "config.grad_accum=2",
        "config.batch_size=2", "config.epoch_scan=true",
        "config.data_backend=device",
    )
    with pytest.raises(ValueError, match="grad_accum"):
        train(cfg)


@pytest.mark.quick
def test_make_optimizer_variants(synthetic_dataset, tmp_path):
    """adam/adamw/sgd (+grad_clip) all expose the StepLR-writable
    learning_rate hyperparam; default tree matches the original adam."""
    import jax.numpy as jnp
    import optax

    cfg = _compose(synthetic_dataset, tmp_path)
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    grads = {"w": jnp.full((3, 3), 2.0), "b": jnp.ones((3,))}

    # default == the reference-parity hardcoded adam tree (ckpt compat)
    ref = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.init_lr)
    assert jax.tree_util.tree_structure(
        make_optimizer(cfg).init(params)
    ) == jax.tree_util.tree_structure(ref.init(params))

    for name in ("adam", "adamw", "sgd"):
        cfg.optimizer = name
        cfg.weight_decay = 0.01
        cfg.momentum = 0.9
        tx = make_optimizer(cfg)
        state = tx.init(params)
        state.hyperparams["learning_rate"] = jnp.asarray(0.5, jnp.float32)
        updates, _ = tx.update(grads, state, params)
        assert all(
            np.isfinite(np.asarray(u)).all()
            for u in jax.tree_util.tree_leaves(updates)
        ), name

    cfg.optimizer = "sgd"
    cfg.momentum = 0.0
    cfg.grad_clip = 1.0
    tx = make_optimizer(cfg)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    gnorm = float(
        optax.global_norm(jax.tree_util.tree_map(lambda u: u, updates))
    )
    # clip(1.0) then sgd(lr): update norm == lr * 1.0
    np.testing.assert_allclose(gnorm, float(cfg.init_lr), rtol=1e-5)

    cfg.optimizer = "nope"
    with pytest.raises(KeyError):
        make_optimizer(cfg)


@pytest.mark.quick
def test_grad_accum_dice_warns_once(synthetic_dataset, tmp_path):
    """grad_accum with a sum-normalized criterion (dice family) changes
    semantics vs full-batch — make_train_step must say so (VERDICT r4 #5)."""
    import warnings as _warnings

    from general_medical_image_segmentation_cnn_framework_tpu.models import (
        build_model,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        make_train_step,
    )

    cfg = _compose(
        synthetic_dataset, tmp_path, "config.grad_accum=2",
        "config.batch_size=2", "config.loss=bce+dice",
    )
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    with pytest.warns(UserWarning, match="PER MICROBATCH"):
        make_train_step(cfg, model, tx)

    # mean-reduced criteria stay exact -> no warning
    cfg.loss = "bce"
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        make_train_step(cfg, model, tx)


@pytest.mark.quick
def test_adamw_decay_skips_norm_and_bias(synthetic_dataset, tmp_path):
    """adamw's decoupled weight decay applies only to rank>1 kernels —
    BatchNorm scale/bias and conv biases must not decay (ADVICE r4).
    With zero grads, adam's update is 0 (eps-damped numerator is exactly
    0), so any movement comes purely from the decay term."""
    import jax.numpy as jnp

    cfg = _compose(synthetic_dataset, tmp_path)
    cfg.optimizer = "adamw"
    cfg.weight_decay = 0.1
    tx = make_optimizer(cfg)
    params = {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,)),
              "scale": jnp.ones((2,))}
    state = tx.init(params)
    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero, state, params)
    assert float(np.abs(np.asarray(updates["kernel"])).max()) > 0
    np.testing.assert_array_equal(np.asarray(updates["bias"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["scale"]), 0.0)
