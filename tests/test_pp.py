"""Pipeline parallelism (parallel/pp.py): GPipe primitive equivalence
(forward + gradients) and the UNETR pipelined-encoder integration, on the
8-device fake-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from general_medical_image_segmentation_cnn_framework_tpu.parallel.pp import (
    gpipe,
    stack_blocks,
    unetr_pp_forward,
    unstack_blocks,
)


def _stage_mesh(s=4):
    return Mesh(np.array(jax.devices()[:s]), ("stage",))


def _toy_blocks(L=8, d=16, seed=0):
    """L identical-shape MLP blocks: x -> x + tanh(x @ w + b)."""
    r = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(r.normal(0, 0.3, (L, d, d)).astype(np.float32)),
        "b": jnp.asarray(r.normal(0, 0.1, (L, d)).astype(np.float32)),
    }


def _toy_apply(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _sequential(params, x):
    L = params["w"].shape[0]
    outs = []
    for i in range(L):
        x = _toy_apply(jax.tree.map(lambda a: a[i], params), x)
        outs.append(x)
    return outs


@pytest.mark.quick
def test_gpipe_matches_sequential():
    mesh = _stage_mesh(4)
    params = _toy_blocks(L=8, d=16)
    x = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (8, 16)).astype(np.float32)
    )
    boundaries = gpipe(_toy_apply, params, x, mesh, n_micro=4)
    seq = _sequential(params, x)
    assert boundaries.shape == (4, 8, 16)
    # stage s boundary = after block (s+1)*L/S
    for s in range(4):
        np.testing.assert_allclose(
            boundaries[s], seq[(s + 1) * 2 - 1], rtol=1e-6, atol=1e-6
        )


@pytest.mark.quick
def test_gpipe_microbatch_counts():
    mesh = _stage_mesh(2)
    params = _toy_blocks(L=4, d=8)
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (12, 8)).astype(np.float32)
    )
    want = _sequential(params, x)[-1]
    for m in (2, 3, 6, 12):
        got = gpipe(_toy_apply, params, x, mesh, n_micro=m)[-1]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.quick
def test_gpipe_grads_match_sequential():
    mesh = _stage_mesh(4)
    params = _toy_blocks(L=8, d=16)
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (8, 16)).astype(np.float32)
    )

    def loss_pp(p):
        return jnp.sum(gpipe(_toy_apply, p, x, mesh, n_micro=4)[-1] ** 2)

    def loss_seq(p):
        return jnp.sum(_sequential(p, x)[-1] ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_seq = jax.grad(loss_seq)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
        g_pp, g_seq,
    )


@pytest.mark.quick
def test_stack_unstack_roundtrip():
    params = {
        f"Blk_{i}": {"w": jnp.full((2, 2), float(i))} for i in range(4)
    }
    stacked = stack_blocks(params, "Blk_", 4)
    assert stacked["w"].shape == (4, 2, 2)
    back = unstack_blocks(stacked, "Blk_")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), params, back
    )


def _tiny_unetr():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unetr import (
        UNETR,
    )

    model = UNETR(
        img_shape=(32, 32, 32), input_dim=1, output_dim=2, embed_dim=64,
        patch_size=16, num_heads=4, num_layers=12, dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (4, 32, 32, 32, 1)).astype(
            np.float32
        )
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def test_unetr_pp_eval_matches_sequential():
    model, variables, x = _tiny_unetr()
    want = model.apply(variables, x, train=False)
    # S=4 is the aligned stage count on 8 devices ({3,6,9,12} must land on
    # stage boundaries; S=2 -> 6-block stages, misaligned, asserts)
    got = unetr_pp_forward(
        model, variables, x, _stage_mesh(4), train=False, n_micro=2
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    with pytest.raises(AssertionError, match="must align"):
        unetr_pp_forward(
            model, variables, x, _stage_mesh(2), train=False, n_micro=2
        )


def test_unetr_pp_train_mode_runs():
    model, variables, x = _tiny_unetr()
    mesh = _stage_mesh(4)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    def loss_fn(params):
        logits, upd = unetr_pp_forward(
            model, {**variables, "params": params}, x, mesh, train=True,
            n_micro=2, rngs=rngs, mutable=True,
        )
        return jnp.mean(logits**2), upd

    (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    # gradients reach the pipelined encoder blocks AND the decoder
    g_blk = jax.tree.leaves(grads["_TransformerBlock_7"])
    assert all(np.isfinite(np.asarray(g)).all() for g in g_blk)
    assert any(float(jnp.abs(g).max()) > 0 for g in g_blk)
    # batch_stats were updated by the decoder BN layers
    before = variables["batch_stats"]["_ConvBNReLU_0"]
    after = upd["batch_stats"]["_ConvBNReLU_0"]
    assert not all(
        np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )


def test_train_driver_pp_branch():
    """make_forward routes through the pipelined forward when
    config.pipeline_stages > 1 (the CLI wiring, train.py)."""
    from types import SimpleNamespace

    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        make_forward,
    )

    model, variables, x = _tiny_unetr()
    cfg = SimpleNamespace(
        network="unetr", pipeline_stages=4, pp_microbatches=2
    )
    fwd = make_forward(cfg, model)
    out, upd = fwd(variables, x, False, None, False)
    assert upd == {}
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)

    # mutable train path returns batch_stats updates like model.apply
    rngs = {"dropout": jax.random.PRNGKey(1)}
    out_t, upd_t = fwd(variables, x, True, rngs, ["batch_stats"])
    assert "batch_stats" in upd_t and np.isfinite(np.asarray(out_t)).all()

    # non-transformer networks are rejected
    with pytest.raises(AssertionError, match="stacked-block"):
        make_forward(
            SimpleNamespace(network="unet", pipeline_stages=4), model
        )
