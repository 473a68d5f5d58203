"""T-layout Pallas conv3d parity (interpret mode; Mosaic compile + timing
happen on hardware via scripts/bench_tlayout_conv.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from general_medical_image_segmentation_cnn_framework_tpu.ops import pallas_tlayout
from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
    conv3d_decomposed,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_tlayout, "_INTERPRET", True)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


@pytest.mark.parametrize(
    "shape,cin,cout,bh",
    [
        ((1, 6, 8, 128), 32, 32, 4),
        ((2, 4, 8, 128), 32, 16, 8),
        ((1, 5, 6, 256), 64, 8, 3),
    ],
)
def test_conv3d_tlayout_matches_decomposed(shape, cin, cout, bh):
    n, d, h, w = shape
    x = _rand((n, d, h, w, cin), seed=1)
    k = _rand((3, 3, 3, cin, cout), seed=2) * 0.2
    want = conv3d_decomposed(jnp.asarray(x), jnp.asarray(k))
    x_t = pallas_tlayout.to_tlayout(jnp.asarray(x))
    y_pre = pallas_tlayout.conv2d_tapcols_tlayout(x_t, jnp.asarray(k), bh=bh)
    got_t = pallas_tlayout._shift_add_depth(y_pre, cout, x.dtype)
    got = pallas_tlayout.from_tlayout(got_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_conv3d_tlayout_vjp_matches_xla():
    """custom-VJP grads (Pallas dgrad + relabeled-conv wgrad) vs autodiff
    of the plain XLA conv."""
    n, d, h, w, cin, cout = 1, 4, 4, 128, 32, 8
    x = jnp.asarray(_rand((n, d, h, w, cin), seed=3))
    k = jnp.asarray(_rand((3, 3, 3, cin, cout), seed=4) * 0.2)
    ct = jnp.asarray(_rand((n, d, h, w, cout), seed=5))

    def ref_loss(x, k):
        return jnp.sum(conv3d_decomposed(x, k) * ct)

    def got_loss(x, k):
        ct_t = pallas_tlayout.to_tlayout(ct)
        y = pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
        return jnp.sum(y * ct_t)

    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(got_loss, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


def test_supported_gate():
    assert pallas_tlayout.supported(32, 32, 128, jnp.bfloat16)
    assert pallas_tlayout.supported(64, 32, 256, jnp.float32)
    assert not pallas_tlayout.supported(1, 32, 128, jnp.float32)  # stem
    assert not pallas_tlayout.supported(32, 32, 64, jnp.float32)  # W<128
