"""Tensor parallelism (Megatron-style, parallel/tp.py): sharded
transformer weights must reproduce replicated results exactly, with the
attention/MLP weights actually distributed over the 'model' mesh axis.

SGD (not Adam) for trajectory comparisons: conv biases in front of BN
have ~1e-9 noise gradients that Adam turns into +-lr/step random walks
between any two numerically-distinct-but-equal implementations
(CLAUDE.md round-4 note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
from general_medical_image_segmentation_cnn_framework_tpu.parallel.mesh import (
    make_mesh,
    replicate,
)
from general_medical_image_segmentation_cnn_framework_tpu.parallel.tp import (
    shard_params_tp,
    supports_tp,
    tp_shardings,
)


def _tiny_unetr():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unetr import (
        UNETR,
    )

    # embed_dim 32 / 4 heads: both divide the model axis sizes below
    return UNETR(
        img_shape=(32, 32, 32), input_dim=1, output_dim=2, embed_dim=32,
        patch_size=16, num_heads=4, dropout=0.0, num_layers=12,
    )


def _tiny_vtnet():
    cfg = ConfigDict(
        {
            "network": "vtnet", "in_classes": 1, "out_classes": 2,
            "patch_size": (32, 32, 32), "precision": "float32",
            "init_type": "none",
        }
    )
    model = build_model(cfg)
    return type(model)(
        **{
            **{
                f.name: getattr(model, f.name)
                for f in type(model).__dataclass_fields__.values()
                if f.name not in ("parent", "name")
            },
            "embed_dim": 12, "win_size": 4, "img_size": (32, 32, 32),
        }
    )


def test_tp_rules_shard_attention_and_mlp():
    """The sharding tree actually distributes q/k/v + MLP weights and
    leaves convs/norms replicated."""
    mesh = make_mesh("data=2,model=4")
    model = _tiny_unetr()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 32, 1)), train=False,
    )
    sh = tp_shardings(variables["params"], mesh, "unetr")
    from jax.tree_util import tree_flatten_with_path

    flat, _ = tree_flatten_with_path(sh)
    by_path = {
        "/".join(str(getattr(k, "key", k)) for k in kp): s for kp, s in flat
    }
    # q projection: column-parallel
    assert by_path[
        "_TransformerBlock_0/_SelfAttention_0/Dense_0/kernel"
    ].spec == P(None, "model")
    # out projection: row-parallel
    assert by_path[
        "_TransformerBlock_0/_SelfAttention_0/Dense_3/kernel"
    ].spec == P("model", None)
    assert by_path[
        "_TransformerBlock_0/_SelfAttention_0/Dense_3/bias"
    ].spec == P()
    # MLP fc1 column, fc2 row
    assert by_path["_TransformerBlock_0/Dense_0/kernel"].spec == P(None, "model")
    assert by_path["_TransformerBlock_0/Dense_1/kernel"].spec == P("model", None)
    # convs replicated
    assert by_path["TorchConv_0/Conv_0/kernel"].spec == P()
    # every matched leaf is genuinely smaller on-device after device_put
    params = jax.device_put(variables["params"], sh)
    q = params["_TransformerBlock_0"]["_SelfAttention_0"]["Dense_0"]["kernel"]
    assert q.addressable_shards[0].data.shape == (32, 8)  # 32 x (32/4)


def test_tp_divisibility_guard_replicates():
    """A model-axis size that doesn't divide a matched dim must fall back
    to replication for that leaf, never an invalid sharding."""
    mesh = make_mesh("model=8")  # 8 does not divide embed_dim=4... use tree
    tree = {
        "_SelfAttention_0": {
            "Dense_0": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))}
        }
    }
    sh = tp_shardings(tree, mesh, "unetr")
    assert sh["_SelfAttention_0"]["Dense_0"]["kernel"].spec == P()
    assert sh["_SelfAttention_0"]["Dense_0"]["bias"].spec == P()


@pytest.mark.parametrize("network", ["unetr", "vtnet"])
def test_tp_forward_matches_replicated(network):
    """TP-sharded forward logits == replicated logits."""
    mesh = make_mesh("data=2,model=4")
    model = _tiny_unetr() if network == "unetr" else _tiny_vtnet()
    x = (
        np.random.default_rng(3)
        .normal(size=(2, 32, 32, 32, 1))
        .astype(np.float32)
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    fwd = jax.jit(
        lambda v, xb: model.apply(v, xb, train=False), static_argnums=()
    )
    base = np.asarray(fwd(variables, jnp.asarray(x)))

    params_tp = shard_params_tp(variables["params"], mesh, network)
    rest = {k: replicate(mesh, v) for k, v in variables.items() if k != "params"}
    xb = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None, None)))
    got = np.asarray(fwd({"params": params_tp, **rest}, xb))
    np.testing.assert_allclose(base, got, rtol=2e-5, atol=2e-5)


def test_tp_train_trajectory_matches_replicated():
    """3 SGD steps with TP sharding (2-D data x model mesh) == 3 steps
    replicated: gradient all-reduces over 'data' and the Megatron
    partial-sum all-reduces over 'model' both land where GSPMD puts
    them, without touching the train step."""
    from general_medical_image_segmentation_cnn_framework_tpu.parallel.mesh import (
        shard_batch,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    import optax

    cfg = ConfigDict(
        {
            "network": "unetr", "in_classes": 1, "out_classes": 2,
            "patch_size": (32, 32, 32), "precision": "float32",
            "init_type": "kaiming", "init_lr": 0.004, "loss": "bce",
            "batch_size": 2,
        }
    )
    model = _tiny_unetr()
    mesh = make_mesh("data=2,model=4")
    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(11)
    batches = [
        (
            rng_np.normal(size=(2, 32, 32, 32, 1)).astype(np.float32),
            (rng_np.uniform(size=(2, 32, 32, 32, 1)) > 0.5).astype(np.float32),
        )
        for _ in range(3)
    ]

    trajs = []
    for use_tp in (False, True):
        params, stats, _, _ = init_train_state(cfg, model, rng)
        # SGD, not the production Adam: Adam normalizes by grad magnitude,
        # turning reassociation-level grad noise into +-lr sign flips
        # (measured ~2*lr deltas after ONE step) — optimizer chaos, not
        # TP semantics (same policy as test_shardmap_dp).
        tx = optax.sgd(float(cfg.init_lr))
        opt = tx.init(params)
        step = make_train_step(cfg, model, tx)
        if use_tp:
            params = shard_params_tp(params, mesh, "unetr")
            opt = shard_params_tp(opt, mesh, "unetr")
            stats = replicate(mesh, stats)
        losses = []
        p_step1 = None
        for x, y in batches:
            if use_tp:
                b = shard_batch(mesh, {"x": x, "y": y})
                xb, yb = b["x"], b["y"]
            else:
                xb, yb = jnp.asarray(x), jnp.asarray(y)
            params, stats, opt, loss, _ = step(params, stats, opt, xb, yb, rng)
            losses.append(float(loss))
            if p_step1 is None:
                p_step1 = jax.device_get(params)
        trajs.append((losses, p_step1))

    (l0, p0), (l1, p1) = trajs
    # After ONE step the param delta is exactly lr * grad: the only
    # TP-vs-replicated difference is f32 reassociation in the model-axis
    # all-reduce (~1e-6 relative on gradients), so this comparison is
    # TIGHT — a wrong sharding (garbage gather / missing reduce) is O(1).
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    # Over 3 steps the epsilon drift compounds chaotically through 12
    # transformer blocks + BN (ReLU boundary flips), so only the LOSS
    # trajectory is asserted at a loose bound — it pins training-level
    # equivalence without the chaotic per-weight amplification.
    np.testing.assert_allclose(l0[:1], l1[:1], rtol=1e-5)
    np.testing.assert_allclose(l0, l1, rtol=5e-3)


def test_supports_tp():
    assert supports_tp("unetr") and supports_tp("vtnet")
    assert not supports_tp("unet")
