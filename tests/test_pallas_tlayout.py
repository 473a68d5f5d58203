"""T-layout Pallas conv3d parity (interpret mode; Mosaic compile + timing
happen on hardware via scripts/bench_tlayout_conv.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from general_medical_image_segmentation_cnn_framework_tpu.ops import pallas_tlayout
from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
    conv3d_decomposed,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_tlayout, "_INTERPRET", True)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


@pytest.mark.parametrize(
    "shape,cin,cout,bh",
    [
        ((1, 6, 8, 128), 32, 32, 4),
        ((2, 4, 8, 128), 32, 16, 8),
        ((1, 5, 6, 256), 64, 8, 3),
    ],
)
def test_conv3d_tlayout_matches_decomposed(shape, cin, cout, bh):
    n, d, h, w = shape
    x = _rand((n, d, h, w, cin), seed=1)
    k = _rand((3, 3, 3, cin, cout), seed=2) * 0.2
    want = conv3d_decomposed(jnp.asarray(x), jnp.asarray(k))
    x_t = pallas_tlayout.to_tlayout(jnp.asarray(x))
    y_pre = pallas_tlayout.conv2d_tapcols_tlayout(x_t, jnp.asarray(k), bh=bh)
    got_t = pallas_tlayout._shift_add_depth(y_pre, cout, x.dtype)
    got = pallas_tlayout.from_tlayout(got_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_conv3d_tlayout_vjp_matches_xla():
    """custom-VJP grads (Pallas dgrad + relabeled-conv wgrad) vs autodiff
    of the plain XLA conv."""
    n, d, h, w, cin, cout = 1, 4, 4, 128, 32, 8
    x = jnp.asarray(_rand((n, d, h, w, cin), seed=3))
    k = jnp.asarray(_rand((3, 3, 3, cin, cout), seed=4) * 0.2)
    ct = jnp.asarray(_rand((n, d, h, w, cout), seed=5))

    def ref_loss(x, k):
        return jnp.sum(conv3d_decomposed(x, k) * ct)

    def got_loss(x, k):
        ct_t = pallas_tlayout.to_tlayout(ct)
        y = pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
        return jnp.sum(y * ct_t)

    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(got_loss, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


def test_supported_gate():
    assert pallas_tlayout.supported(32, 32, 128, jnp.bfloat16)
    assert pallas_tlayout.supported(64, 32, 256, jnp.float32)
    assert not pallas_tlayout.supported(1, 32, 128, jnp.float32)  # stem
    # W<128: eligible via depth-slice lane folding when D % (128//W) == 0
    assert pallas_tlayout.supported(32, 32, 64, jnp.float32)  # d unknown
    assert pallas_tlayout.supported(64, 64, 64, jnp.float32, d=64)
    assert not pallas_tlayout.supported(64, 64, 64, jnp.float32, d=5)
    assert pallas_tlayout.supported(32, 32, 32, jnp.float32, d=32)
    assert not pallas_tlayout.supported(32, 32, 16, jnp.float32, d=16)  # W<32
    assert not pallas_tlayout.supported(32, 32, 96, jnp.float32, d=8)  # 128%W


@pytest.mark.parametrize(
    "shape,cin,cout,bh",
    [
        ((1, 6, 8, 64), 32, 32, 4),  # fold=2 (enc2-like)
        ((2, 4, 8, 32), 32, 16, 8),  # fold=4
        ((1, 8, 6, 64), 64, 8, 3),  # fold=2, odd bh
    ],
)
def test_conv3d_tlayout_folded_matches_decomposed(shape, cin, cout, bh):
    """W<128 depth-slice lane folding is exact (segment edge masks)."""
    n, d, h, w = shape
    x = _rand((n, d, h, w, cin), seed=11)
    k = _rand((3, 3, 3, cin, cout), seed=12) * 0.2
    want = conv3d_decomposed(jnp.asarray(x), jnp.asarray(k))
    x_t = pallas_tlayout.to_tlayout(jnp.asarray(x))
    y_pre = pallas_tlayout.conv2d_tapcols_tlayout(x_t, jnp.asarray(k), bh=bh)
    got_t = pallas_tlayout._shift_add_depth(y_pre, cout, x.dtype)
    got = pallas_tlayout.from_tlayout(got_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_conv3d_tlayout_folded_vjp_matches_xla():
    n, d, h, w, cin, cout = 1, 4, 4, 64, 32, 8
    x = jnp.asarray(_rand((n, d, h, w, cin), seed=13))
    k = jnp.asarray(_rand((3, 3, 3, cin, cout), seed=14) * 0.2)
    ct = jnp.asarray(_rand((n, d, h, w, cout), seed=15))

    def ref_loss(x, k):
        return jnp.sum(conv3d_decomposed(x, k) * ct)

    def got_loss(x, k):
        y = pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
        return jnp.sum(y * pallas_tlayout.to_tlayout(ct))

    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(got_loss, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


@pytest.mark.parametrize("shape,cin,cout,bh", [((1, 4, 6, 128), 32, 16, 3),
                                               ((2, 3, 8, 256), 32, 8, 4)])
def test_wgrad_pallas_matches_xla(shape, cin, cout, bh):
    """The Pallas wgrad (im2col rebuild + grid-accumulated g @ rhs^T)
    equals the relabeled-dims XLA conv wgrad."""
    n, d, h, w = shape
    x_t = pallas_tlayout.to_tlayout(jnp.asarray(_rand((n, d, h, w, cin), seed=21)))
    g_t = pallas_tlayout.to_tlayout(jnp.asarray(_rand((n, d, h, w, cout), seed=22)))
    want = pallas_tlayout._wgrad_tlayout(x_t, g_t).transpose(1, 2, 4, 0, 3)
    got = pallas_tlayout.wgrad_tapcols_tlayout(x_t, g_t, bh=bh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_vjp_with_pallas_wgrad_matches_xla(monkeypatch):
    """End-to-end custom VJP with GMIST_TLAYOUT_WGRAD=pallas equals plain
    XLA autodiff (both grads)."""
    monkeypatch.setenv("GMIST_TLAYOUT_WGRAD", "pallas")
    n, d, h, w, cin, cout = 1, 3, 4, 128, 32, 8
    x = jnp.asarray(_rand((n, d, h, w, cin), seed=23))
    k = jnp.asarray(_rand((3, 3, 3, cin, cout), seed=24) * 0.2)
    ct = jnp.asarray(_rand((n, d, h, w, cout), seed=25))

    def ref_loss(x, k):
        return jnp.sum(conv3d_decomposed(x, k) * ct)

    def got_loss(x, k):
        y = pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
        return jnp.sum(y * pallas_tlayout.to_tlayout(ct))

    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(got_loss, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


@pytest.mark.parametrize(
    "shape,cin,cout,bh",
    [
        ((1, 6, 8, 128), 32, 32, 4),
        ((2, 4, 8, 128), 32, 16, 8),
        ((1, 5, 6, 256), 64, 8, 3),
        ((1, 3, 12, 128), 32, 8, 4),  # hc < h (multi-chunk grid)
    ],
)
def test_conv3d_tlayout_fused_matches_decomposed(shape, cin, cout, bh):
    """v2 (in-VMEM depth accumulation, single kernel) == XLA conv."""
    n, d, h, w = shape
    x = _rand((n, d, h, w, cin), seed=31)
    k = _rand((3, 3, 3, cin, cout), seed=32) * 0.2
    want = conv3d_decomposed(jnp.asarray(x), jnp.asarray(k))
    x_t = pallas_tlayout.to_tlayout(jnp.asarray(x))
    got_t = pallas_tlayout.conv3d_tlayout_fused(x_t, jnp.asarray(k), bh=bh)
    got = pallas_tlayout.from_tlayout(got_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize(
    "shape,cin,cout,bh",
    [
        ((1, 6, 8, 64), 32, 32, 4),  # fold=2 (enc2-like)
        ((2, 4, 8, 32), 32, 16, 8),  # fold=4
        ((1, 8, 6, 64), 64, 8, 3),  # fold=2, odd bh
        ((1, 8, 8, 32), 32, 8, 4),  # fold=4, two plane-groups (carry path)
    ],
)
def test_conv3d_tlayout_fused_folded_matches_decomposed(shape, cin, cout, bh):
    """v2 folded: the fold-carry lane rolls make the in-VMEM depth
    accumulation exact across fold segments AND plane-group boundaries."""
    n, d, h, w = shape
    x = _rand((n, d, h, w, cin), seed=41)
    k = _rand((3, 3, 3, cin, cout), seed=42) * 0.2
    want = conv3d_decomposed(jnp.asarray(x), jnp.asarray(k))
    x_t = pallas_tlayout.to_tlayout(jnp.asarray(x))
    got_t = pallas_tlayout.conv3d_tlayout_fused(x_t, jnp.asarray(k), bh=bh)
    got = pallas_tlayout.from_tlayout(got_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_conv3d_tlayout_fused_folded_vjp(monkeypatch):
    """Folded v2 under the env dispatch: fwd + both grads vs XLA."""
    monkeypatch.setenv("GMIST_TLAYOUT_V2", "1")
    n, d, h, w, cin, cout = 1, 4, 4, 64, 32, 8
    x = jnp.asarray(_rand((n, d, h, w, cin), seed=43))
    k = jnp.asarray(_rand((3, 3, 3, cin, cout), seed=44) * 0.2)
    ct = jnp.asarray(_rand((n, d, h, w, cout), seed=45))

    def ref_loss(x, k):
        return jnp.sum(conv3d_decomposed(x, k) * ct)

    def got_loss(x, k):
        y = pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
        return jnp.sum(y * pallas_tlayout.to_tlayout(ct))

    np.testing.assert_allclose(
        np.asarray(
            pallas_tlayout.from_tlayout(
                pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
            )
        ),
        np.asarray(conv3d_decomposed(x, k)),
        atol=2e-4,
    )
    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(got_loss, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


def test_conv3d_tlayout_fused_single_depth():
    """d=1 edge: both depth neighbors out of range every step."""
    x = _rand((1, 1, 4, 128, 32), seed=33)
    k = _rand((3, 3, 3, 32, 8), seed=34) * 0.2
    want = conv3d_decomposed(jnp.asarray(x), jnp.asarray(k))
    got = pallas_tlayout.from_tlayout(
        pallas_tlayout.conv3d_tlayout_fused(
            pallas_tlayout.to_tlayout(jnp.asarray(x)), jnp.asarray(k), bh=2
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_conv3d_tlayout_v2_env_dispatch(monkeypatch):
    """GMIST_TLAYOUT_V2=1 routes conv3d_tlayout through the fused kernel
    (W%128 only) with identical results and working custom-VJP grads."""
    monkeypatch.setenv("GMIST_TLAYOUT_V2", "1")
    n, d, h, w, cin, cout = 1, 4, 4, 128, 32, 8
    x = jnp.asarray(_rand((n, d, h, w, cin), seed=35))
    k = jnp.asarray(_rand((3, 3, 3, cin, cout), seed=36) * 0.2)
    ct = jnp.asarray(_rand((n, d, h, w, cout), seed=37))
    want = conv3d_decomposed(x, k)
    got = pallas_tlayout.from_tlayout(
        pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def ref_loss(x, k):
        return jnp.sum(conv3d_decomposed(x, k) * ct)

    def got_loss(x, k):
        y = pallas_tlayout.conv3d_tlayout(pallas_tlayout.to_tlayout(x), k)
        return jnp.sum(y * pallas_tlayout.to_tlayout(ct))

    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(got_loss, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


@pytest.mark.parametrize("w", [128, 64])
def test_convblock_tlayout_fused_eval_matches_default(monkeypatch, w):
    """Eval ConvBlock under GMIST_TLAYOUT_CONV+V2: BN folded into weights,
    bias+ReLU fused into the kernel flush — logits match the default
    Conv->BN->ReLU block on realistic (non-init) batch stats, and the
    variable tree is checkpoint-identical."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        ConvBlock,
    )

    x = jnp.asarray(_rand((1, 4, 4, w, 32), seed=51))
    block = ConvBlock(features=16, kernel_size=3, stride=1, padding=1)
    v = block.init(jax.random.PRNGKey(0), x, train=True)
    # non-trivial running stats so the BN fold is actually exercised
    bs = jax.tree_util.tree_map(lambda a: a, v["batch_stats"])
    bs["BatchNorm_0"]["mean"] = jnp.asarray(_rand((16,), seed=52)) * 0.1
    bs["BatchNorm_0"]["var"] = jnp.abs(jnp.asarray(_rand((16,), seed=53))) + 0.5
    v = {"params": v["params"], "batch_stats": bs}
    want = block.apply(v, x, train=False)

    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    monkeypatch.setenv("GMIST_TLAYOUT_V2", "1")
    v2 = block.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        block.init(jax.random.PRNGKey(0), x, train=True)
    )
    got = block.apply(v, x, train=False)
    assert float(jnp.min(got)) == 0.0  # ReLU actually applied
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_batchnorm_channel_axis_matches_last():
    """BatchNorm(channel_axis=3) on T-layout == BatchNorm on NDHWC,
    both the normalized output and the running-stat updates."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.norm import (
        BatchNorm,
    )

    x = jnp.asarray(_rand((2, 3, 4, 8, 16), seed=61))  # NDHWC, C=16
    x_t = jnp.transpose(x, (0, 1, 2, 4, 3))
    bn = BatchNorm()
    bn_t = BatchNorm(channel_axis=3)
    v = bn.init(jax.random.PRNGKey(0), x)
    want, wmut = bn.apply(v, x, mutable=["batch_stats"])
    got_t, gmut = bn_t.apply(v, x_t, mutable=["batch_stats"])
    got = jnp.transpose(got_t, (0, 1, 2, 4, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(gmut["batch_stats"][k]),
            np.asarray(wmut["batch_stats"][k]),
            rtol=1e-6,
        )


@pytest.mark.parametrize("w", [128, 64])
def test_convblock_tlayout_resident_train_matches_default(monkeypatch, w):
    """Train-mode T-layout residency (conv+BN+ReLU in [N,D,H,C,W]):
    logits and batch-stat updates match the default block; tree
    checkpoint-identical; composes with the v2 fused conv."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        ConvBlock,
    )

    x = jnp.asarray(_rand((1, 4, 4, w, 32), seed=62))
    block = ConvBlock(features=16, kernel_size=3, stride=1, padding=1)
    v = block.init(jax.random.PRNGKey(0), x, train=True)
    want, wmut = block.apply(v, x, train=True, mutable=["batch_stats"])

    for extra_env in ({}, {"GMIST_TLAYOUT_V2": "1"}):
        monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
        for k, val in extra_env.items():
            monkeypatch.setenv(k, val)
        v2 = block.init(jax.random.PRNGKey(0), x, train=True)
        assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
        got, gmut = block.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(gmut["batch_stats"]["BatchNorm_0"]["mean"]),
            np.asarray(wmut["batch_stats"]["BatchNorm_0"]["mean"]),
            atol=1e-5,
        )
        monkeypatch.delenv("GMIST_TLAYOUT_V2", raising=False)


def test_convblock_tlayout_resident_grads_match(monkeypatch):
    """Residency path end-to-end grads (through BN in T-layout and the
    custom-VJP conv) vs the default block."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        ConvBlock,
    )

    x = jnp.asarray(_rand((1, 4, 4, 128, 32), seed=63))
    ct = jnp.asarray(_rand((1, 4, 4, 128, 16), seed=64))
    block = ConvBlock(features=16, kernel_size=3, stride=1, padding=1)
    v = block.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params, x):
        y, _ = block.apply(
            {**v, "params": params}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(y * ct)

    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(v["params"], x)
    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    gp, gx = jax.grad(loss, argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    for pref, pgot in zip(
        jax.tree_util.tree_leaves(gp_ref), jax.tree_util.tree_leaves(gp)
    ):
        np.testing.assert_allclose(
            np.asarray(pgot), np.asarray(pref), atol=3e-3
        )


def test_torchconv_tlayout_routing_matches_default(monkeypatch):
    """GMIST_TLAYOUT_CONV routes eligible TorchConvs (SAME k3s1, Cin%32,
    W%128) through the Pallas kernel with an IDENTICAL param tree and
    matching logits; ineligible convs (stem Cin=1, W=64 levels, k1 heads)
    fall back silently."""
    import os

    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        TorchConv,
    )

    x = jnp.asarray(_rand((1, 4, 4, 128, 32), seed=7))
    conv = TorchConv(features=16, kernel_size=3, stride=1, padding=1)
    v = conv.init(jax.random.PRNGKey(0), x)
    want = conv.apply(v, x)

    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    v2 = conv.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    got = conv.apply(v, x)
    assert os.environ.get("GMIST_TLAYOUT_CONV") == "1"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # ineligible (W=64) still works and matches
    x64 = jnp.asarray(_rand((1, 4, 4, 64, 32), seed=8))
    v64 = conv.init(jax.random.PRNGKey(0), x64)
    np.testing.assert_allclose(
        np.asarray(conv.apply(v64, x64)),
        np.asarray(conv.apply(v64, x64)),
    )


def test_unet_forward_with_tlayout_routing(monkeypatch):
    """Whole-model check: unet3d logits with the T-layout route enabled
    (interpret mode) match the default path at a W=128 shape."""
    from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model

    config = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": 2,
            "patch_size": (16, 16, 128), "init_lr": 1e-3,
            "init_type": "kaiming", "precision": "float32", "seed": 0,
        }
    )
    model = build_model(config)
    x = jnp.asarray(_rand((1, 16, 16, 128, 1), seed=9))
    v = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.PRNGKey(0))
    want = model.apply(v, x, train=False)
    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    got = model.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


@pytest.mark.quick
def test_unetr_decoder_tlayout_routing_audit(monkeypatch):
    """VERDICT r3 #7 routing half, at the flagship precision (bf16): the
    UNETR decoder convs the r3 transformer profile measured at 91.6% of
    the step route through the T-layout kernel WHERE THEY FIT — W=128
    direct, W=64 via depth-slice lane folding, the Cin=4 stem via the
    cinpad wrapper. The 32^3 level's big-channel merges (Cin 256/512) now
    correctly do NOT route: their [3*Cout, 9*Cin] weight block + im2col
    scratch exceed the 16 MB scoped-vmem limit — the r9 HW session hit
    exactly that ("Ran out of memory in memory space vmem ... 18.60M",
    Cin=512 Cout=256) when the old shape-only gate routed them. Shape-
    level audit via jax.eval_shape: no compute, no compile."""
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unetr import (
        UNETR,
    )

    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    calls = []
    real = pallas_tlayout.conv3d_tlayout_cinpad

    def spy(x_t, kernel):
        calls.append(tuple(x_t.shape))
        return real(x_t, kernel)

    monkeypatch.setattr(pallas_tlayout, "conv3d_tlayout_cinpad", spy)

    model = UNETR(
        img_shape=(128, 128, 128), input_dim=4, output_dim=3,
        dtype=jnp.bfloat16,
    )
    x = jax.ShapeDtypeStruct((1, 128, 128, 128, 4), jnp.float32)
    variables = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x
    )
    calls.clear()
    jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False), variables, x
    )

    # x_t is [N, D, H, C, W]: reference decoder pyramid (unetr.py:277-294
    # in /root/reference) routes the z3-branch 128->128 convs at 64^3 and
    # 4 convs at 128^3 (Cin=4 stem + post-stem + final x2); the Cin>=256
    # merges and the 16^3 level stay on the XLA tap-grouped route (VMEM
    # budget / W<32 respectively)
    from collections import Counter

    ws = Counter(s[-1] for s in calls)
    assert ws == {64: 2, 128: 4}, ws
    # Cin sublane-aligned or below 32 (cinpad zero-pads those to 32)
    assert all(s[3] % 32 == 0 or s[3] < 32 for s in calls), calls
    # the supported() gate itself: BOTH r9 HW crash shapes are rejected
    # at bf16 (Cin=512 Cout=256 needed 18.60M scoped vmem; Cin=256
    # Cout=128 with bias 17.11M), while the small unet shapes stay
    assert not pallas_tlayout.supported(512, 256, 32, jnp.bfloat16, d=32)
    assert not pallas_tlayout.supported(256, 128, 64, jnp.bfloat16, d=64)
    assert pallas_tlayout.supported(128, 128, 128, jnp.bfloat16)
    assert pallas_tlayout.supported(64, 64, 64, jnp.bfloat16, d=64)


@pytest.mark.parametrize("cin,w", [(1, 128), (4, 128), (4, 64), (48, 128)])
def test_conv3d_tlayout_cinpad_matches_decomposed(cin, w):
    """Misaligned-Cin route (zero-pad Cin to 32 outside the kernel):
    forward exactness vs the XLA decomposed conv, both v1 and v2."""
    x = jnp.asarray(_rand((1, 4, 4, w, cin), seed=70))
    k = jnp.asarray(_rand((3, 3, 3, cin, 8), seed=71) * 0.1)
    want = conv3d_decomposed(x, k, (1, 1, 1), (1, 1, 1))
    x_t = pallas_tlayout.to_tlayout(x)
    got = pallas_tlayout.from_tlayout(pallas_tlayout.conv3d_tlayout_cinpad(x_t, k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    got2 = pallas_tlayout.from_tlayout(
        pallas_tlayout.conv3d_tlayout_fused_cinpad(x_t, k)
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=2e-5)


def test_conv3d_tlayout_cinpad_vjp_matches_xla():
    """dx and dw through the cinpad wrapper (pad's transpose slices the
    zero-channel rows away) == the XLA conv's gradients."""
    x = jnp.asarray(_rand((1, 4, 4, 128, 1), seed=72))
    k = jnp.asarray(_rand((3, 3, 3, 1, 8), seed=73) * 0.1)
    ct = jnp.asarray(_rand((1, 4, 4, 128, 8), seed=74))

    def loss_ref(x, k):
        return jnp.sum(conv3d_decomposed(x, k, (1, 1, 1), (1, 1, 1)) * ct)

    def loss_tl(x, k):
        y = pallas_tlayout.conv3d_tlayout_cinpad(pallas_tlayout.to_tlayout(x), k)
        return jnp.sum(pallas_tlayout.from_tlayout(y) * ct)

    gx_ref, gk_ref = jax.grad(loss_ref, (0, 1))(x, k)
    gx, gk = jax.grad(loss_tl, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


def test_torchconv_cinpad_routing(monkeypatch):
    """Cin=1 stem TorchConv routes through the cinpad T-layout path by
    default (GMIST_TLAYOUT_CONV=1) and stays XLA with
    GMIST_TLAYOUT_CINPAD=0; outputs match either way."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        TorchConv,
    )

    x = jnp.asarray(_rand((1, 4, 4, 128, 1), seed=75))
    conv = TorchConv(features=8, kernel_size=3, stride=1, padding=1)
    v = conv.init(jax.random.PRNGKey(0), x)
    want = conv.apply(v, x)

    calls = []
    real = pallas_tlayout.conv3d_tlayout_cinpad

    def spy(x_t, kernel):
        calls.append(tuple(x_t.shape))
        return real(x_t, kernel)

    monkeypatch.setattr(pallas_tlayout, "conv3d_tlayout_cinpad", spy)
    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    got = conv.apply(v, x)
    assert calls == [(1, 4, 4, 1, 128)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)

    monkeypatch.setenv("GMIST_TLAYOUT_CINPAD", "0")
    calls.clear()
    got_off = conv.apply(v, x)
    assert calls == []
    np.testing.assert_allclose(np.asarray(got_off), np.asarray(want), atol=5e-4)


@pytest.mark.quick
def test_disable_tlayout_for_mesh(monkeypatch):
    """Multi-device meshes drop the Pallas conv routes (pallas_call is
    not GSPMD-partitionable); a 1-device mesh keeps them."""
    import os

    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        disable_tlayout_for_mesh,
    )

    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    monkeypatch.setenv("GMIST_TLAYOUT_V2", "1")
    assert not disable_tlayout_for_mesh(1)
    assert os.environ.get("GMIST_TLAYOUT_CONV") == "1"
    assert disable_tlayout_for_mesh(8)
    assert "GMIST_TLAYOUT_CONV" not in os.environ
    assert "GMIST_TLAYOUT_V2" not in os.environ
    assert not disable_tlayout_for_mesh(8)  # idempotent once cleared


def _conv2d_ref(x, k):
    """NHWC SAME k3s1 reference conv."""
    dn = ("NHWC", "HWIO", "NHWC")
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(x.shape, k.shape, dn),
    )


@pytest.mark.parametrize(
    "n,h,w,cin,cout",
    [
        (1, 8, 128, 32, 16),
        (2, 6, 256, 64, 8),
        (4, 8, 64, 32, 16),  # fold=2 over batch
        (1, 8, 128, 3, 8),   # cinpad (RGB-like stem)
    ],
)
def test_conv2d_plane_tlayout_matches_xla(n, h, w, cin, cout):
    x = jnp.asarray(_rand((n, h, w, cin), seed=81))
    k = jnp.asarray(_rand((3, 3, cin, cout), seed=82) * 0.2)
    want = _conv2d_ref(x, k)
    x_t = jnp.transpose(x, (0, 1, 3, 2))  # [N, H, C, W]
    got_t = pallas_tlayout.conv2d_tlayout_cinpad(x_t, k)
    got = jnp.transpose(got_t, (0, 1, 3, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_conv2d_tlayout_vjp_matches_xla():
    n, h, w, cin, cout = 2, 6, 128, 32, 8
    x = jnp.asarray(_rand((n, h, w, cin), seed=83))
    k = jnp.asarray(_rand((3, 3, cin, cout), seed=84) * 0.2)
    ct = jnp.asarray(_rand((n, h, w, cout), seed=85))

    def ref_loss(x, k):
        return jnp.sum(_conv2d_ref(x, k) * ct)

    def got_loss(x, k):
        x_t = jnp.transpose(x, (0, 1, 3, 2))
        y = pallas_tlayout.conv2d_tlayout_cinpad(x_t, k)
        return jnp.sum(jnp.transpose(y, (0, 1, 3, 2)) * ct)

    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(got_loss, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=3e-3)


def test_torchconv2d_tlayout_routing_matches_default(monkeypatch):
    """2-D TorchConv routes through conv2d_plane_tlayout with an
    IDENTICAL param tree (same 'Conv_0' child scope as the nn.Conv
    fallback) and matching outputs."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        TorchConv,
    )

    x = jnp.asarray(_rand((2, 8, 128, 32), seed=86))
    conv = TorchConv(features=16, kernel_size=3, stride=1, padding=1)
    v = conv.init(jax.random.PRNGKey(0), x)
    want = conv.apply(v, x)

    monkeypatch.setenv("GMIST_TLAYOUT_CONV", "1")
    v2 = conv.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    calls = []
    real = pallas_tlayout.conv2d_tlayout_cinpad

    def spy(x_t, kernel):
        calls.append(tuple(x_t.shape))
        return real(x_t, kernel)

    monkeypatch.setattr(pallas_tlayout, "conv2d_tlayout_cinpad", spy)
    got = conv.apply(v, x)
    assert calls == [(2, 8, 32, 128)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
