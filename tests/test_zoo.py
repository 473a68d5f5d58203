"""Model-zoo forward shape tests (every registered architecture).

Mirrors the reference's __main__ smoke blocks (SURVEY §4) as real tests.
Tiny widths/shapes keep CPU compile time bounded; the persistent
compilation cache (conftest) makes re-runs fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.models import (
    available_models,
    build_model,
)

# (network, spatial shape, constructor overrides for small test instances)
CASES_3D = [
    ("unet", (16, 16, 16), {"init_features": 4}),
    ("res_unet", (16, 16, 16), {"base_n_filter": 4}),
    ("vnet", (16, 16, 16), {}),
    ("densevoxelnet", (16, 16, 16), {}),
    ("densenet", (16, 16, 16), {"num_init_features": 16, "growth_rate": 8, "bn_size": 2}),
    ("highresnet", (16, 16, 16), {"initial_out_channels_power": 2}),
    ("csrnet", (16, 16, 16), {"init_features": 4}),
    ("er_net", (16, 16, 16), {}),
    ("re_net", (16, 16, 16), {}),
    ("dunet", (16, 16, 16), {"unet_init_features": 8}),
    ("unetr", (32, 32, 32), {"embed_dim": 32, "num_heads": 4, "num_layers": 12}),
    ("vtnet", (32, 32, 32), {"embed_dim": 12, "win_size": 4, "img_size": (32, 32, 32)}),
    ("fusionnet", (16, 16, 16), {"unet_init_features": 4, "cnn_init_features": 4}),
    ("fcn3d", (32, 32, 32), {}),
]

CASES_2D = [
    ("unet2d", (32, 32), {}),
    ("segnet", (32, 32), {}),
    ("deeplab", (32, 32), {}),
    ("pspnet", (32, 32), {}),
    ("miniseg", (64, 64), {}),
    ("unetpp", (64, 64), {}),
    ("fcn2d", (32, 32), {}),
    ("highres2dnet", (16, 16), {"initial_out_channels_power": 2}),
]


def _build_small(name, overrides):
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict

    cfg = ConfigDict(
        {
            "network": name,
            "in_classes": 1,
            "out_classes": 2,
            "patch_size": (32, 32, 32),
            "init_type": "kaiming",
            "precision": "float32",
        }
    )
    model = build_model(cfg)
    if overrides:
        model = type(model)(**{**{f.name: getattr(model, f.name) for f in
                                  type(model).__dataclass_fields__.values()
                                  if f.name not in ("parent", "name")}, **overrides})
    return model


@pytest.mark.parametrize("name,shape,overrides", CASES_3D, ids=[c[0] for c in CASES_3D])
def test_3d_model_forward(name, shape, overrides):
    model = _build_small(name, overrides)
    x = jnp.zeros((1,) + shape + (1,), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    y = model.apply(variables, x, train=False)
    if isinstance(y, tuple):
        y = y[0]
    assert y.shape == (1,) + shape + (2,), f"{name}: {y.shape}"
    assert np.isfinite(np.asarray(y)).all(), name


@pytest.mark.parametrize("name,shape,overrides", CASES_2D, ids=[c[0] for c in CASES_2D])
def test_2d_model_forward(name, shape, overrides):
    model = _build_small(name, overrides)
    x = jnp.zeros((1,) + shape + (1,), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    y = model.apply(variables, x, train=False)
    if isinstance(y, tuple):
        y = y[0]
    assert y.shape == (1,) + shape + (2,), f"{name}: {y.shape}"
    assert np.isfinite(np.asarray(y)).all(), name


def test_is_net_forward():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.is_net import ISNet
    from general_medical_image_segmentation_cnn_framework_tpu.ops.fft import band_split

    model = ISNet(init_features=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    low, high = band_split(x, 0.04)
    variables = model.init(jax.random.PRNGKey(0), x, low, high, train=False)
    out1, out2 = model.apply(variables, x, low, high, train=False)
    assert out1.shape == (1, 16, 16, 16, 2)
    assert out2.shape == (1, 16, 16, 16, 2)


def test_registry_complete():
    names = set(available_models())
    expected = {c[0] for c in CASES_3D} | {c[0] for c in CASES_2D} | {"IS", "vtnet"}
    missing = expected - names
    assert not missing, f"registry missing: {missing}"


def test_vtnet_non_divisible_input_pads_like_reference():
    """Advisor r2 (medium): the matmul patch embed must accept spatial dims
    not divisible by patch_size (4). The reference PatchEmbed3D zero-pads
    up to a multiple first (reference vt_unet.py:752-759) and the output
    lives at the padded resolution. (Odd token counts — e.g. spatial 27 ->
    7 tokens — remain unsupported in BOTH frameworks: the reference's
    decoder torch.cat hits the same merge/expand parity mismatch.)"""
    model = _build_small(
        "vtnet", {"embed_dim": 12, "win_size": 4, "img_size": (32, 32, 32)}
    )
    x = jnp.zeros((1, 30, 29, 32, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 32, 2), y.shape
    assert np.isfinite(np.asarray(y)).all()
