"""Multi-device tests on the 8-device host-platform fake mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.parallel.mesh import (
    make_mesh,
    parse_mesh_shape,
    replicate,
    shard_batch,
)


def test_eight_fake_devices():
    assert len(jax.devices()) == 8


def test_parse_mesh_shape():
    assert parse_mesh_shape("data=-1", 8) == {"data": 8}
    assert parse_mesh_shape("data=4,model=2", 8) == {"data": 4, "model": 2}
    assert parse_mesh_shape("data=-1,model=2", 8) == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        parse_mesh_shape("data=3", 8)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh("data=-1")
    batch = {"x": np.zeros((8, 4, 4, 4, 1), np.float32)}
    sharded = shard_batch(mesh, batch)
    shard_shapes = [s.data.shape for s in sharded["x"].addressable_shards]
    assert all(s == (1, 4, 4, 4, 1) for s in shard_shapes)


def test_data_parallel_train_step(tiny_config):
    """Full jitted train step over a sharded batch on the 8-device mesh:
    XLA must insert gradient all-reduces automatically."""
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    tiny_config.batch_size = 8
    model = build_model(tiny_config)
    rng = jax.random.PRNGKey(0)
    params, batch_stats, opt_state, tx = init_train_state(tiny_config, model, rng)

    mesh = make_mesh("data=-1")
    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)

    x = np.random.default_rng(0).normal(size=(8, 16, 16, 16, 1)).astype(np.float32)
    y = (np.random.default_rng(1).uniform(size=(8, 16, 16, 16, 1)) > 0.5).astype(
        np.float32
    )
    batch = shard_batch(mesh, {"x": x, "y": y})

    step = make_train_step(tiny_config, model, tx)
    params, batch_stats, opt_state, loss, dice = step(
        params, batch_stats, opt_state, batch["x"], batch["y"], rng
    )
    assert np.isfinite(float(loss))
    assert 0.0 <= float(dice) <= 1.0


def test_sharded_equals_single_device(tiny_config):
    """Data-parallel step must produce the same params as single-device
    (same global batch, batch-global BN stats == sync-BN)."""
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    tiny_config.batch_size = 8
    model = build_model(tiny_config)
    rng = jax.random.PRNGKey(0)

    x = np.random.default_rng(0).normal(size=(8, 16, 16, 16, 1)).astype(np.float32)
    y = (np.random.default_rng(1).uniform(size=(8, 16, 16, 16, 1)) > 0.5).astype(
        np.float32
    )

    results = []
    for shard in (False, True):
        params, batch_stats, opt_state, tx = init_train_state(tiny_config, model, rng)
        step = make_train_step(tiny_config, model, tx)
        if shard:
            mesh = make_mesh("data=-1")
            params = replicate(mesh, params)
            batch_stats = replicate(mesh, batch_stats)
            opt_state = replicate(mesh, opt_state)
            batch = shard_batch(mesh, {"x": x, "y": y})
            xs, ys = batch["x"], batch["y"]
        else:
            xs, ys = jnp.asarray(x), jnp.asarray(y)
        new_params, new_stats, _, loss, dice = step(
            params, batch_stats, opt_state, xs, ys, rng
        )
        results.append((jax.device_get(new_params), float(loss), float(dice)))

    (p0, l0, d0), (p1, l1, d1) = results
    assert abs(l0 - l1) < 1e-5
    assert abs(d0 - d1) < 1e-5
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(p1)
    # Adam rescales by 1/sqrt(v): reduction-order noise on near-zero grads
    # can flip an update's sign, so allow ~2*lr slack per element.
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, atol=5e-3)
