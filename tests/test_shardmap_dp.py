"""dp_backend=shard_map: the per-device (manual-SPMD) forward must be
semantically identical to the GSPMD jit path — same predictions, same
pmean-synced batch-global BN statistics, same training trajectory — while
keeping pallas_call legal per device (GSPMD cannot partition one).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
from general_medical_image_segmentation_cnn_framework_tpu.parallel.mesh import (
    make_data_mesh,
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def _cfg(**kw):
    base = {
        "network": "unet", "in_classes": 1, "out_classes": 2,
        "patch_size": (16, 16, 16), "init_lr": 1e-3, "init_type": "kaiming",
        "precision": "float32", "seed": 0, "loss": "bce",
    }
    base.update(kw)
    return ConfigDict(base)


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_data_mesh("data=-1", 8)


def test_shardmap_forward_matches_global(mesh8):
    """ConvBlock forward under make_shardmap_forward == the plain global
    forward: logits equal and BN batch stats EXACTLY batch-global (the
    pmean sync restores what GSPMD computes automatically)."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        ConvBlock,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        make_forward,
        make_shardmap_forward,
    )

    cfg = _cfg()
    model = ConvBlock(features=8, kernel_size=3, stride=1, padding=1)
    x = jnp.asarray(_rand((8, 4, 4, 16, 4), seed=1))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    fwd = make_forward(cfg, model)
    sm_fwd = make_shardmap_forward(cfg, model, mesh8, fwd)

    want, wupd = fwd(v, x, True, {}, ["batch_stats"])
    got, gupd = jax.jit(
        lambda v, x: sm_fwd(v, x, True, {}, ["batch_stats"])
    )(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    for k in ("mean", "var"):
        # pmean-of-partial-means reassociates the f32 sum: ~1e-10 absolute
        np.testing.assert_allclose(
            np.asarray(gupd["batch_stats"]["BatchNorm_0"][k]),
            np.asarray(wupd["batch_stats"]["BatchNorm_0"][k]),
            rtol=1e-4, atol=1e-8,
        )


def test_shardmap_forward_routes_pallas_per_device(mesh8, monkeypatch):
    """With the T-layout route enabled (interpret mode), the shard_map
    forward runs the Pallas conv per device and still matches the global
    XLA forward — the configuration GSPMD cannot compile at all."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        ConvBlock,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.ops import (
        pallas_tlayout,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        make_forward,
        make_shardmap_forward,
    )

    cfg = _cfg()
    model = ConvBlock(features=8, kernel_size=3, stride=1, padding=1)
    x = jnp.asarray(_rand((8, 4, 4, 128, 32), seed=2))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    fwd = make_forward(cfg, model)
    want, wupd = fwd(v, x, True, {}, ["batch_stats"])

    monkeypatch.setattr(pallas_tlayout, "_INTERPRET", True)
    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    calls = []
    real = pallas_tlayout.conv3d_tlayout_cinpad

    def spy(x_t, kernel):
        calls.append(tuple(x_t.shape))
        return real(x_t, kernel)

    monkeypatch.setattr(pallas_tlayout, "conv3d_tlayout_cinpad", spy)
    sm_fwd = make_shardmap_forward(cfg, model, mesh8, fwd)
    got, gupd = sm_fwd(v, x, True, {}, ["batch_stats"])
    assert calls and all(s[0] == 1 for s in calls), calls  # per-device shard
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(gupd["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(wupd["batch_stats"]["BatchNorm_0"]["mean"]),
        atol=1e-5,
    )


def test_shardmap_train_step_trajectory_matches(mesh8):
    """4 unet steps with make_train_step(mesh=...) == the single-program
    step on the same global batches: losses, params, and BN running
    stats all match tightly.

    SGD is used instead of the production Adam ON BOTH SIDES (the
    optimizer is identical code outside the shard_map region): Adam
    normalizes gradients by their magnitude, which turns the ~0
    float-noise gradients of the BN-cancelled conv biases into +-lr
    random walks that diverge between any two numerically-distinct-but-
    equivalent implementations — pure optimizer chaos, not DP semantics.
    SGD keeps the comparison at reassociation level (~1e-5)."""
    import optax

    from general_medical_image_segmentation_cnn_framework_tpu.models import (
        build_model,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.parallel.mesh import (
        replicate,
        shard_batch,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    cfg = _cfg()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    params, stats, _, _ = init_train_state(cfg, model, rng)
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    step_ref = make_train_step(cfg, model, tx)
    step_sm = make_train_step(cfg, model, tx, mesh=mesh8)

    xs = [_rand((8,) + tuple(cfg.patch_size) + (1,), seed=10 + i) for i in range(4)]
    ys = [
        (np.random.default_rng(20 + i).uniform(size=(8,) + tuple(cfg.patch_size) + (1,)) > 0.5).astype(np.float32)
        for i in range(4)
    ]

    # the jitted step donates its state args: give the reference run its
    # own copies so the originals survive for the shard_map run
    _clone = lambda t: jax.tree_util.tree_map(jnp.array, t)
    p_r, s_r, o_r = _clone(params), _clone(stats), _clone(opt)
    losses_r = []
    for x, y in zip(xs, ys):
        p_r, s_r, o_r, loss, dice = step_ref(p_r, s_r, o_r, jnp.asarray(x), jnp.asarray(y), rng)
        losses_r.append(float(loss))

    p_s, s_s, o_s = (
        replicate(mesh8, params), replicate(mesh8, stats), replicate(mesh8, opt)
    )
    losses_s = []
    for x, y in zip(xs, ys):
        batch = shard_batch(mesh8, {"x": x, "y": y}, dim=0)
        p_s, s_s, o_s, loss, dice = step_sm(p_s, s_s, o_s, batch["x"], batch["y"], rng)
        losses_s.append(float(loss))

    np.testing.assert_allclose(losses_s, losses_r, rtol=1e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_s), jax.tree_util.tree_leaves(p_r)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_s), jax.tree_util.tree_leaves(s_r)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
