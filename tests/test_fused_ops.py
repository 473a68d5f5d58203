"""Pallas fused loss+metric kernel: numerical parity with the reference
formulas (jnp path on CPU; kernel logic via the Pallas interpreter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu import losses, metrics
from general_medical_image_segmentation_cnn_framework_tpu.ops import fused


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 8, 8, 8, 2)).astype(np.float32)
    gt = (rng.uniform(size=(2, 8, 8, 8, 1)) > 0.6).astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(gt)


def _reference(logits, gt):
    gt2 = losses.one_hot_background(gt)
    loss = losses.bce_with_logits(logits, gt2)
    mask = jnp.argmax(logits, axis=-1)
    gt_idx = jnp.argmax(gt2, axis=-1)
    jac, dice = metrics.dice_jaccard(gt_idx, mask)
    return loss, jac, dice


def test_fused_matches_reference_jnp_path(data):
    logits, gt = data
    loss_f, jac_f, dice_f = fused.fused_bce_dice_metrics(logits, gt)
    loss_r, jac_r, dice_r = _reference(logits, gt)
    assert abs(float(loss_f) - float(loss_r)) < 1e-5
    assert abs(float(jac_f) - float(jac_r)) < 1e-5
    assert abs(float(dice_f) - float(dice_r)) < 1e-5


def test_fused_gradient_matches(data):
    logits, gt = data

    g_fused = jax.grad(lambda l: fused.fused_bce_dice_metrics(l, gt)[0])(logits)
    g_ref = jax.grad(lambda l: _reference(l, gt)[0])(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-6)


def test_fused_pallas_interpreter_path(data, monkeypatch):
    logits, gt = data
    monkeypatch.setattr(fused, "_FORCE_PALLAS", True)
    monkeypatch.setattr(fused, "_INTERPRET", True)
    loss_f, jac_f, dice_f = fused.fused_bce_dice_metrics(logits, gt)
    loss_r, jac_r, dice_r = _reference(logits, gt)
    assert abs(float(loss_f) - float(loss_r)) < 1e-5
    assert abs(float(dice_f) - float(dice_r)) < 1e-5
    g_fused = jax.grad(lambda l: fused.fused_bce_dice_metrics(l, gt)[0])(logits)
    g_ref = jax.grad(lambda l: _reference(l, gt)[0])(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-5)


def test_fused_with_padding(monkeypatch):
    """Voxel count not a multiple of the tile: padding correction holds."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, 5, 7, 3, 2)).astype(np.float32))
    gt = jnp.asarray((rng.uniform(size=(1, 5, 7, 3, 1)) > 0.5).astype(np.float32))
    loss_f, _, dice_f = fused.fused_bce_dice_metrics(logits, gt)
    loss_r, _, dice_r = _reference(logits, gt)
    # f32 cancellation in the padding-constant subtraction costs ~1 ulp*pad
    assert abs(float(loss_f) - float(loss_r)) < 1e-4
    assert abs(float(dice_f) - float(dice_r)) < 1e-5
