"""Model zoo shape/dtype tests (the reference's __main__ smoke blocks,
done properly — SURVEY §4) plus norm-layer numerics vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.models import (
    available_models,
    build_model,
)
from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (
    UNet3D,
)


def test_registry_contains_flagship():
    names = available_models()
    assert "unet" in names


def test_unet3d_forward_shapes():
    model = UNet3D(in_channels=1, out_channels=2, init_features=8)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 16, 16, 16, 2)
    assert y.dtype == jnp.float32


def test_unet3d_train_mode_updates_batch_stats():
    model = UNet3D(in_channels=1, out_channels=2, init_features=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_batchnorm_matches_torch():
    import torch

    from general_medical_image_segmentation_cnn_framework_tpu.nn.norm import BatchNorm

    x = np.random.default_rng(0).normal(size=(4, 6, 6, 6, 3)).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, updates = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm3d(3)
    xt = torch.tensor(np.moveaxis(x, -1, 1))
    yt = tbn(xt).detach().numpy()
    np.testing.assert_allclose(np.moveaxis(np.asarray(y), -1, 1), yt, atol=1e-4)
    # running stats parity (torch stores unbiased var, momentum 0.1)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        atol=1e-4,
    )


def test_batchnorm_eval_uses_running_stats():
    from general_medical_image_segmentation_cnn_framework_tpu.nn.norm import BatchNorm

    x = jnp.ones((2, 4, 4, 4, 2)) * 3.0
    bn = BatchNorm(use_running_average=True)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y = bn.apply(variables, x)
    # running mean=0, var=1 -> y ~= x
    np.testing.assert_allclose(np.asarray(y), 3.0, atol=1e-4)


def test_instancenorm_matches_torch():
    import torch

    from general_medical_image_segmentation_cnn_framework_tpu.nn.norm import InstanceNorm

    x = np.random.default_rng(1).normal(size=(2, 5, 5, 5, 4)).astype(np.float32)
    inorm = InstanceNorm()
    variables = inorm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = inorm.apply(variables, jnp.asarray(x))
    yt = torch.nn.InstanceNorm3d(4)(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
    np.testing.assert_allclose(np.moveaxis(np.asarray(y), -1, 1), yt, atol=1e-4)


def test_conv_transpose_torch_output_size():
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        TorchConvTranspose,
    )

    x = jnp.zeros((1, 8, 8, 8, 4))
    m = TorchConvTranspose(features=2, kernel_size=2, stride=2)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 16, 16, 16, 2)  # (in-1)*2 + 2 = 16


def test_torch_conv_padding_semantics():
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import TorchConv

    x = jnp.zeros((1, 9, 9, 9, 1))
    # k3 s2 p1: torch output = floor((9 + 2 - 3)/2) + 1 = 5
    m = TorchConv(features=2, kernel_size=3, stride=2, padding=1)
    variables = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(variables, x).shape == (1, 5, 5, 5, 2)


def test_weight_init_types():
    for init_type in ["normal", "xavier", "xavier_uniform", "kaiming", "orthogonal", "none"]:
        model = UNet3D(in_channels=1, out_channels=2, init_features=4, init_type=init_type)
        x = jnp.zeros((1, 16, 16, 16, 1))  # 4 pooling levels need >= 16^3
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(variables, x, train=False)
        assert np.isfinite(np.asarray(y)).all()


def test_build_model_from_config(tiny_config):
    model = build_model(tiny_config)
    assert isinstance(model, UNet3D)
    assert model.out_channels == 2


def test_remat_does_not_change_param_tree():
    """remat=true / remat_policy must produce the SAME variable tree as
    remat=false — nn.remat's wrapper class would otherwise auto-name
    scopes 'CheckpointConvBlock_i' and make training checkpoints
    unloadable at predict time (found by the whole-volume run, r3)."""
    import jax
    import jax.numpy as jnp

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (
        UNet3D,
    )

    trees = []
    for remat, policy in ((False, ""), (True, ""), (True, "conv"), (True, "dots")):
        m = UNet3D(init_features=4, remat=remat, remat_policy=policy)
        v = jax.eval_shape(
            lambda k: m.init(k, jnp.zeros((1, 16, 16, 16, 1)), train=False),
            jax.random.PRNGKey(0),
        )
        trees.append(jax.tree_util.tree_structure(v))
    assert all(t == trees[0] for t in trees[1:]), "param tree depends on remat"
