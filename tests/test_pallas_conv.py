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


def test_pallas_conv3d_custom_vjp_matches_xla():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 5, 6, 7, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 5, 6, 7, 4)).astype(np.float32))

    def native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    got = pallas_conv.pallas_conv3d(x, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(native(x, kernel)), atol=1e-4)

    gx_p, gk_p = jax.grad(
        lambda xx, kk: jnp.sum(pallas_conv.pallas_conv3d(xx, kk) * r), argnums=(0, 1)
    )(x, kernel)
    gx_n, gk_n = jax.grad(
        lambda xx, kk: jnp.sum(native(xx, kk) * r), argnums=(0, 1)
    )(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_n), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_n), rtol=1e-4, atol=1e-4)


def _convblock_pair(pallas_flag):
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import ConvBlock

    return ConvBlock(
        features=4, kernel_size=3, stride=1, padding=1, norm="batch", act="relu",
        pallas=pallas_flag,
    )


def test_convblock_pallas_eval_parity():
    """Fused-eval ConvBlock == regular ConvBlock on the SAME variables
    (checkpoint-identical tree)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 3)).astype(np.float32))
    plain, fused = _convblock_pair(False), _convblock_pair(True)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    v2 = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    # make running stats non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        if a.ndim == 1 else a,
        variables,
    )
    y_plain = plain.apply(variables, x, train=False)
    y_fused = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), rtol=1e-4, atol=1e-4
    )


def test_convblock_pallas_train_parity():
    """Train-mode pallas ConvBlock: same output AND same batch_stats update."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 3)).astype(np.float32))
    plain, fused = _convblock_pair(False), _convblock_pair(True)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    y_p, upd_p = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    y_f, upd_f = fused.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p), rtol=1e-4, atol=1e-4)
    for (pa, pb) in zip(
        jax.tree_util.tree_leaves(upd_p), jax.tree_util.tree_leaves(upd_f)
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-4)


def test_pallas_convblock_training_trajectory():
    """Few-step Adam trajectory through the pallas ConvBlock (custom VJP)
    must track the XLA path: same losses, same final params. Keeps the
    kernel's GRADIENT honest in CI without TPU hardware (interpret mode)."""
    import optax
    from flax import linen as nn

    class _Net(nn.Module):
        pallas: bool

        @nn.compact
        def __call__(self, x, train=True):
            from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
                ConvBlock, TorchConv,
            )

            y = ConvBlock(features=4, kernel_size=3, stride=1, padding=1,
                          norm="batch", act="relu", pallas=self.pallas)(x, train)
            return TorchConv(features=2, kernel_size=1)(y)

    rng = np.random.default_rng(5)
    x_all = [rng.normal(size=(2, 4, 6, 8, 3)).astype(np.float32) for _ in range(4)]
    y_all = [(rng.uniform(size=(2, 4, 6, 8, 1)) > 0.5).astype(np.float32)
             for _ in range(4)]

    trajs = []
    for flag in (False, True):
        net = _Net(pallas=flag)
        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x_all[0]), train=False)
        params, stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p, s, xb, yb):
            out, upd = net.apply(
                {"params": p, "batch_stats": s}, xb, train=True,
                mutable=["batch_stats"],
            )
            gt2 = jnp.concatenate([1 - yb, yb], axis=-1)
            loss = jnp.mean(
                jnp.maximum(out, 0) - out * gt2 + jnp.log1p(jnp.exp(-jnp.abs(out)))
            )
            return loss, upd["batch_stats"]

        losses = []
        for xb, yb in zip(x_all, y_all):
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats, jnp.asarray(xb), jnp.asarray(yb)
            )
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        trajs.append((losses, jax.device_get(params)))

    (l0, p0), (l1, p1) = trajs
    np.testing.assert_allclose(l0, l1, rtol=1e-4, atol=1e-5)
    # Adam normalizes by sqrt(v): near-zero-gradient leaves amplify
    # fp32-level summation-order differences up to ~lr per step, so param
    # tolerance is looser than the per-step gradient parity test's 1e-4
    # (test_pallas_conv3d_custom_vjp_matches_xla pins the VJP itself).
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_tiled_padded_cout_kernel_matches_reference():
    """Pad-Cout-to-128 H-tiled kernel (shallow-layer layout): parity incl.
    non-multiple W and the channel zero-padding."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 6, 16, 12, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    got = pallas_conv.fused_conv3d_bn_relu_tiled(x, k, b, tile_h=8)
    assert got.shape == (1, 6, 16, 12, 128)
    want = pallas_conv.reference_conv3d_bn_relu(x, k, b)
    np.testing.assert_allclose(
        np.asarray(got[..., :5]), np.asarray(want), rtol=1e-4, atol=1e-4
    )
    # padded channels are exactly relu(0 + 0) == 0
    np.testing.assert_array_equal(np.asarray(got[..., 5:]), 0.0)
