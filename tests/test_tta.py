"""Flip-averaged test-time augmentation (config.tta).

The wrapper must (a) average logits over exactly the selected flip set,
un-flipping each output (verified against independently computed
model.apply calls, not the wrapper's own code), (b) stay out of the way
when off, and (c) reject invalid specs / depth flips on 2-D nets.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.predict import (
    make_forward_fn,
    wrap_tta,
)

pytestmark = pytest.mark.quick


class _Cfg:
    def __init__(self, network="unet", tta=""):
        self.network = network
        self.tta = tta


def _conv_model():
    """Asymmetric 3-D conv: NOT flip-equivariant, so TTA genuinely changes
    the logits and any flip-bookkeeping error shows up numerically."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(2, (3, 3, 3), padding="SAME")(x)

    model = Net()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 6, 6, 6, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_tta_off_returns_same_forward():
    cfg = _Cfg(tta="")
    f = lambda v, t: t
    assert wrap_tta(cfg, f) is f


def test_tta_flips_matches_manual_average():
    model, variables, x = _conv_model()
    cfg = _Cfg(tta="flips")
    forward = make_forward_fn(cfg, model)

    got = np.asarray(forward(variables, x))

    combos = [
        c for r in range(4) for c in itertools.combinations((1, 2, 3), r)
    ]
    assert len(combos) == 8
    manual = np.mean(
        [
            np.asarray(
                jnp.flip(
                    model.apply(variables, jnp.flip(x, c) if c else x),
                    c,
                )
                if c
                else model.apply(variables, x)
            )
            for c in combos
        ],
        axis=0,
    )
    np.testing.assert_allclose(got, manual, rtol=1e-6, atol=1e-6)
    # and it differs from the plain forward (the conv is asymmetric)
    plain = np.asarray(model.apply(variables, x))
    assert np.abs(got - plain).max() > 1e-4


def test_tta_axis_subset():
    model, variables, x = _conv_model()
    cfg = _Cfg(tta="flips:hw")
    forward = make_forward_fn(cfg, model)
    got = np.asarray(forward(variables, x))
    combos = [c for r in range(3) for c in itertools.combinations((2, 3), r)]
    assert len(combos) == 4
    manual = np.mean(
        [
            np.asarray(
                jnp.flip(model.apply(variables, jnp.flip(x, c)), c)
                if c
                else model.apply(variables, x)
            )
            for c in combos
        ],
        axis=0,
    )
    np.testing.assert_allclose(got, manual, rtol=1e-6, atol=1e-6)


def test_tta_2d_uses_hw_only():
    """2-D nets: tiles are [B, 1, H, W, C]; 'flips' must skip the depth
    axis (4 combos), and an explicit depth flip is rejected."""
    import flax.linen as nn

    class Net2D(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(2, (3, 3), padding="SAME")(x)

    model = Net2D()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 1, 6, 6, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x[:, 0])

    cfg = _Cfg(network="unet2d", tta="flips")
    forward = make_forward_fn(cfg, model)
    got = np.asarray(forward(variables, x))
    combos = [c for r in range(3) for c in itertools.combinations((2, 3), r)]
    manual = np.mean(
        [
            np.asarray(
                jnp.flip(
                    model.apply(variables, jnp.flip(x, c)[:, 0])[:, None], c
                )
                if c
                else model.apply(variables, x[:, 0])[:, None]
            )
            for c in combos
        ],
        axis=0,
    )
    np.testing.assert_allclose(got, manual, rtol=1e-6, atol=1e-6)

    with pytest.raises(KeyError, match="depth"):
        make_forward_fn(_Cfg(network="unet2d", tta="flips:dh"), model)


def test_tta_bad_specs():
    with pytest.raises(KeyError):
        wrap_tta(_Cfg(tta="rot90"), lambda v, t: t)
    with pytest.raises(KeyError):
        wrap_tta(_Cfg(tta="flips:xq"), lambda v, t: t)
    with pytest.raises(KeyError):
        wrap_tta(_Cfg(tta="flips:"), lambda v, t: t)


def test_tta_composes_with_sliding_window():
    """The wrapped forward drops into the jitted sliding-window scan
    unchanged and the run is deterministic."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        sliding_window_predict,
    )

    model, variables, _ = _conv_model()
    cfg = _Cfg(tta="flips")
    forward = make_forward_fn(cfg, model)
    vol = np.random.default_rng(2).normal(size=(1, 10, 10, 10)).astype(np.float32)
    m1 = sliding_window_predict(forward, variables, vol, (6, 6, 6), (2, 2, 2))
    m2 = sliding_window_predict(forward, variables, vol, (6, 6, 6), (2, 2, 2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert np.asarray(m1).shape == (1, 10, 10, 10)
