"""2-D Swin -> 3-D VT-UNet weight inflation (reference vt_unet.py:1004-1060
via a numpy-level converter; mmcv not required)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from general_medical_image_segmentation_cnn_framework_tpu.utils.inflate_vtunet import (
    inflate_swin2d_into_vtunet,
)


@pytest.fixture(scope="module")
def tiny_vtunet():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.vtnet import (
        VTUNet,
    )

    # H/W must survive three PatchMerging halvings after the /4 patch embed
    model = VTUNet(num_classes=2, input_dim=1, embed_dim=12, win_size=2,
                   img_size=(32, 32, 32))
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables, x


def _fake_swin2d_state_dict(embed=12, heads=(3, 6, 12, 24), depths=(2, 2, 2, 1),
                            win2d=2, in_chans=3):
    """A random 2-D Swin checkpoint with torch naming (numpy arrays)."""
    rng = np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(embed, in_chans, 4, 4)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(embed,)).astype(np.float32),
        "patch_embed.norm.weight": rng.normal(size=(embed,)).astype(np.float32),
        "patch_embed.norm.bias": rng.normal(size=(embed,)).astype(np.float32),
    }
    t2d = (2 * win2d - 1) ** 2
    for i, depth in enumerate(depths):
        dim = embed * 2 ** i
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}."
            sd[p + "norm1.weight"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[p + "norm1.bias"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[p + "norm2.weight"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[p + "norm2.bias"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[p + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
            sd[p + "attn.qkv.bias"] = rng.normal(size=(3 * dim,)).astype(np.float32)
            sd[p + "attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
            sd[p + "attn.proj.bias"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[p + "attn.relative_position_bias_table"] = rng.normal(
                size=(t2d, heads[i])).astype(np.float32)
            sd[p + "attn.relative_position_index"] = np.zeros((1,), np.int64)
            sd[p + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
            sd[p + "mlp.fc1.bias"] = rng.normal(size=(4 * dim,)).astype(np.float32)
            sd[p + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
            sd[p + "mlp.fc2.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        if i < len(depths) - 1:
            sd[f"layers.{i}.downsample.reduction.weight"] = rng.normal(
                size=(2 * dim, 4 * dim)).astype(np.float32)
            sd[f"layers.{i}.downsample.norm.weight"] = rng.normal(size=(4 * dim,)).astype(np.float32)
            sd[f"layers.{i}.downsample.norm.bias"] = rng.normal(size=(4 * dim,)).astype(np.float32)
    return sd


def test_inflation_loads_encoder_and_runs(tiny_vtunet):
    model, variables, x = tiny_vtunet
    sd = _fake_swin2d_state_dict()
    new_params, report = inflate_swin2d_into_vtunet(
        sd, variables["params"], window_size=(2, 2, 2), patch_size=(4, 4, 4)
    )
    loaded = [r for r in report if r.startswith("loaded")]
    skipped = [r for r in report if r.startswith("skip")]
    # every encoder tensor of the fake checkpoint must land
    assert len(loaded) >= 4 + 7 * 12  # stem + (2+2+2+1) blocks x 12 tensors
    assert not any("shape" in s for s in skipped), skipped

    # patch-embed inflation: depth-mean equals the 2-D kernel / kd semantics
    k3 = np.asarray(new_params["SwinTransformerSys3D_0"]["Conv_0"]["kernel"])
    w2 = sd["patch_embed.proj.weight"].mean(axis=1)  # avg RGB -> 1 channel
    np.testing.assert_allclose(
        k3.sum(axis=0)[..., 0, :],  # sum over inflated depth = original 2-D
        np.transpose(w2, (1, 2, 0)),
        rtol=1e-5, atol=1e-6,
    )

    # bias-table inflation: depth-major tiling of the (resized) 2-D table
    blk = new_params["SwinTransformerSys3D_0"]["BasicLayer_0"][
        "SwinTransformerBlock3D_0"]["WindowAttention3D_0"]
    table = np.asarray(blk["relative_position_bias_table"])
    t2d = sd["layers.0.blocks.0.attn.relative_position_bias_table"]
    assert table.shape == (3 * t2d.shape[0], t2d.shape[1])
    np.testing.assert_allclose(table[: t2d.shape[0]], t2d, rtol=1e-6)
    np.testing.assert_allclose(table[t2d.shape[0]: 2 * t2d.shape[0]], t2d, rtol=1e-6)

    # model still runs with the inflated tree
    out = model.apply(
        {"params": new_params}, x, train=False,
    )
    assert out.shape == (1, 32, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_inflation_resizes_mismatched_window(tiny_vtunet):
    """A 2-D checkpoint with a different window size is bicubic-resized."""
    model, variables, x = tiny_vtunet
    sd = _fake_swin2d_state_dict(win2d=3)  # 5x5 table vs target 3x3
    new_params, report = inflate_swin2d_into_vtunet(
        sd, variables["params"], window_size=(2, 2, 2), patch_size=(4, 4, 4)
    )
    assert not any("shape" in r for r in report if r.startswith("skip")), report
    blk = new_params["SwinTransformerSys3D_0"]["BasicLayer_0"][
        "SwinTransformerBlock3D_0"]["WindowAttention3D_0"]
    assert np.asarray(blk["relative_position_bias_table"]).shape == (27, 3)


def test_bicubic_matches_torch_interpolate():
    """The numpy bicubic must bit-match the reference's
    F.interpolate(mode='bicubic', antialias=False) call
    (reference vt_unet.py:1034-1052) across up/down/equal resizes."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from general_medical_image_segmentation_cnn_framework_tpu.utils.inflate_vtunet import (
        _bicubic_resize_table,
    )

    r = np.random.default_rng(0)
    for s1, out_hw in ((13, (13, 15)), (13, (9, 7)), (5, (11, 11)), (7, (7, 7))):
        table = r.normal(size=(s1 * s1, 6)).astype(np.float32)
        got = _bicubic_resize_table(table, out_hw)
        t = torch.from_numpy(table).permute(1, 0).reshape(1, 6, s1, s1)
        want = (
            F.interpolate(t, size=out_hw, mode="bicubic")
            .reshape(6, out_hw[0] * out_hw[1])
            .permute(1, 0)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
