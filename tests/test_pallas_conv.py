"""Pallas fused conv3d+BN+ReLU kernel: parity via the interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.ops import pallas_conv


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_conv, "_INTERPRET", True)


def test_fused_conv_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    got = pallas_conv.fused_conv3d_bn_relu(x, kernel, bias)
    want = pallas_conv.reference_conv3d_bn_relu(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_bn_folding():
    """conv -> BN(eval) -> relu == fused kernel with folded weights."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 4)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(4,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, size=(4,)).astype(np.float32))

    conv = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    bn = scale * (conv - mean) / jnp.sqrt(var + 1e-5) + beta
    want = np.asarray(jnp.maximum(bn, 0.0))

    fk, fb = pallas_conv.fold_batchnorm(kernel, bias, scale, beta, mean, var)
    got = np.asarray(pallas_conv.fused_conv3d_bn_relu(x, fk, fb))
    np.testing.assert_allclose(got, want, atol=1e-4)
