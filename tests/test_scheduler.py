"""Per-epoch LR schedules (config.scheduler): step == reference StepLR
exactly; cosine/poly/warmup are capability extensions."""

import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.train import (
    make_scheduler,
    step_lr,
)

pytestmark = pytest.mark.quick


class _Cfg:
    init_lr = 0.01
    epochs = 100
    scheduler_step_size = 20
    scheduler_gamma = 0.8
    scheduler = "step"
    warmup_epochs = 0
    lr_min = 0.0
    lr_poly_power = 0.9


def test_step_is_reference_steplr():
    cfg = _Cfg()
    sched = make_scheduler(cfg)
    for e in range(100):
        assert sched(e) == step_lr(0.01, 20, 0.8, e)


def test_cosine_endpoints_and_monotone():
    cfg = _Cfg()
    cfg.scheduler = "cosine"
    cfg.lr_min = 1e-4
    sched = make_scheduler(cfg)
    np.testing.assert_allclose(sched(0), 0.01)
    np.testing.assert_allclose(sched(100), 1e-4)
    np.testing.assert_allclose(sched(50), 1e-4 + (0.01 - 1e-4) * 0.5, rtol=1e-6)
    lrs = [sched(e) for e in range(101)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))


def test_poly_endpoints():
    cfg = _Cfg()
    cfg.scheduler = "poly"
    sched = make_scheduler(cfg)
    np.testing.assert_allclose(sched(0), 0.01)
    np.testing.assert_allclose(sched(100), 0.0, atol=1e-12)
    np.testing.assert_allclose(sched(50), 0.01 * 0.5**0.9, rtol=1e-6)


def test_warmup_ramps_then_decays():
    cfg = _Cfg()
    cfg.scheduler = "cosine"
    cfg.warmup_epochs = 10
    cfg.lr_min = 0.001
    sched = make_scheduler(cfg)
    # epoch 0 is the first warmup step (1/10 of the ramp), epoch 9 hits init_lr
    np.testing.assert_allclose(sched(0), 0.001 + (0.01 - 0.001) * 0.1, rtol=1e-6)
    np.testing.assert_allclose(sched(9), 0.01, rtol=1e-6)
    # decay spans the remaining 90 epochs
    np.testing.assert_allclose(sched(100), 0.001, rtol=1e-6)
    # epoch 10 is the decay's t=0 point (== init_lr); 11 is strictly below
    np.testing.assert_allclose(sched(10), 0.01, rtol=1e-6)
    assert sched(11) < 0.01


def test_unknown_scheduler_raises():
    cfg = _Cfg()
    cfg.scheduler = "exponential"
    with pytest.raises(KeyError):
        make_scheduler(cfg)


def test_step_with_warmup_uses_shifted_index():
    """warmup_epochs >= scheduler_step_size: the first post-warmup epoch
    must start at init_lr, not a pre-decayed value (ADVICE r4) — the step
    branch counts epochs AFTER warmup, like cosine/poly."""
    cfg = _Cfg()
    cfg.warmup_epochs = 25  # > step_size=20
    cfg.lr_min = 0.001
    sched = make_scheduler(cfg)
    np.testing.assert_allclose(sched(25), 0.01)  # first post-warmup epoch
    np.testing.assert_allclose(sched(25 + 20), 0.01 * 0.8)
    for e in range(25, 100):
        assert sched(e) == step_lr(0.01, 20, 0.8, e - 25)
