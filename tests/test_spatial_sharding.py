"""Halo-exchange spatially-sharded conv == unsharded conv (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
    conv3d_decomposed,
)
from general_medical_image_segmentation_cnn_framework_tpu.parallel.spatial import (
    spatial_conv3d,
)


def test_spatial_conv_matches_unsharded():
    mesh = Mesh(np.asarray(jax.devices()), ("spatial",))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 8, 8, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))

    want = conv3d_decomposed(x, kernel, (1, 1, 1), (1, 1, 1))
    got = spatial_conv3d(x, kernel, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_spatial_conv_k5():
    mesh = Mesh(np.asarray(jax.devices()), ("spatial",))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 6, 6, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(5, 5, 5, 2, 4)).astype(np.float32))
    want = conv3d_decomposed(x, kernel, (1, 1, 1), (2, 2, 2))
    got = spatial_conv3d(x, kernel, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_gspmd_spatial_sharded_unet_forward_matches():
    """Under plain jit, GSPMD auto-partitions a depth-sharded volume through
    the whole U-Net (inserting halo exchanges) — full-volume inference
    beyond one chip's memory with zero model changes."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (
        UNet3D,
    )

    mesh = Mesh(np.asarray(jax.devices()), ("spatial",))
    model = UNet3D(in_channels=1, out_channels=2, init_features=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 16, 16, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    fwd = jax.jit(lambda v, z: model.apply(v, z, train=False))
    want = np.asarray(fwd(variables, x))

    x_sharded = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    v_repl = jax.device_put(variables, NamedSharding(mesh, P()))
    got = np.asarray(fwd(v_repl, x_sharded))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_gspmd_spatial_sharded_train_step_matches():
    """Full train step with the batch sharded over DEPTH (sequence/spatial
    parallelism): same numerics as unsharded."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (
        UNet3D,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    cfg = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": 2,
            "patch_size": (64, 16, 16), "init_lr": 1e-3,
            "init_type": "kaiming", "precision": "float32", "seed": 0,
        }
    )
    model = UNet3D(in_channels=1, out_channels=2, init_features=4)
    rng = jax.random.PRNGKey(0)
    mesh = Mesh(np.asarray(jax.devices()), ("spatial",))

    x = np.random.default_rng(0).normal(size=(1, 64, 16, 16, 1)).astype(np.float32)
    y = (np.random.default_rng(1).uniform(size=(1, 64, 16, 16, 1)) > 0.5).astype(
        np.float32
    )

    results = []
    for shard in (False, True):
        params, stats, opt, tx = init_train_state(cfg, model, rng)
        step = make_train_step(cfg, model, tx)
        if shard:
            sh = NamedSharding(mesh, P(None, "spatial"))
            xs = jax.device_put(jnp.asarray(x), sh)
            ys = jax.device_put(jnp.asarray(y), sh)
            params = jax.device_put(params, NamedSharding(mesh, P()))
            stats = jax.device_put(stats, NamedSharding(mesh, P()))
            opt = jax.device_put(opt, NamedSharding(mesh, P()))
        else:
            xs, ys = jnp.asarray(x), jnp.asarray(y)
        p, s, o, loss, dice = step(params, stats, opt, xs, ys, rng)
        results.append((float(loss), float(dice)))
    (l0, d0), (l1, d1) = results
    assert abs(l0 - l1) < 1e-5
    assert abs(d0 - d1) < 1e-5


def test_train_cli_spatial_sharding_matches(tiny_config, tmp_path):
    """config.spatial_sharding=true shards each batch's first spatial axis
    over the mesh (whole-volume training for bigger-than-HBM volumes);
    the trajectory must match unsharded training — GSPMD's halo exchanges
    are layout, not semantics."""
    import numpy as np

    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    results = {}
    for name, flag in (("plain", False), ("spatial", True)):
        tiny_config.spatial_sharding = flag
        tiny_config.mesh_shape = "data=-1"
        (tmp_path / name).mkdir(exist_ok=True)
        tiny_config.hydra_path = str(tmp_path / name)
        results[name] = train(tiny_config)

    np.testing.assert_allclose(
        results["spatial"]["loss"], results["plain"]["loss"], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        results["spatial"]["dice"], results["plain"]["dice"], rtol=1e-3, atol=1e-6
    )
