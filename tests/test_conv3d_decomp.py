"""Depth-decomposed conv3d: exactness vs the native lax conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
    conv3d_decomposed,
    eligible,
)


def _native(x, kernel, stride, padding):
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=tuple(stride),
        padding=tuple((p, p) for p in padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("stride", [(1, 1, 1), (2, 2, 2), (2, 1, 1)])
@pytest.mark.parametrize("padding", [(1, 1, 1), (0, 0, 0), (2, 2, 2)])
def test_decomposed_matches_native(k, stride, padding):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 9, 10, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(k, k, k, 4, 6)).astype(np.float32))
    got = conv3d_decomposed(x, kernel, stride, padding)
    want = _native(x, kernel, stride, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_decomposed_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 6, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))

    def loss_d(k):
        return jnp.sum(conv3d_decomposed(x, k, (1, 1, 1), (1, 1, 1)) ** 2)

    def loss_n(k):
        return jnp.sum(_native(x, k, (1, 1, 1), (1, 1, 1)) ** 2)

    gd = jax.grad(loss_d)(kernel)
    gn = jax.grad(loss_n)(kernel)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gn), rtol=1e-3, atol=1e-3)

    gxd = jax.grad(lambda z: jnp.sum(conv3d_decomposed(z, kernel, (1, 1, 1), (1, 1, 1)) ** 2))(x)
    gxn = jax.grad(lambda z: jnp.sum(_native(z, kernel, (1, 1, 1), (1, 1, 1)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gxd), np.asarray(gxn), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("k,padding", [(3, (1, 1, 1)), (3, (0, 0, 0)), (5, (2, 2, 2))])
@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2)])
def test_tapgrouped_matches_native(k, padding, stride):
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_tapgrouped,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 9, 10, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(k, k, k, 4, 6)).astype(np.float32))
    got = conv3d_tapgrouped(x, kernel, stride, padding)
    want = _native(x, kernel, stride, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_tapgrouped_gradients_match():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_tapgrouped,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 6, 7, 6, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 6, 7, 6, 5)).astype(np.float32))

    def loss(f):
        return lambda xx, kk: jnp.sum(f(xx, kk, (1, 1, 1), (1, 1, 1)) * r)

    gx_t, gk_t = jax.grad(loss(conv3d_tapgrouped), argnums=(0, 1))(x, kernel)
    gx_n, gk_n = jax.grad(
        lambda xx, kk: jnp.sum(_native(xx, kk, (1, 1, 1), (1, 1, 1)) * r),
        argnums=(0, 1),
    )(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_n), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_t), np.asarray(gk_n), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,padding", [(3, (1, 1, 1)), (3, (0, 0, 0)), (5, (2, 2, 2))])
@pytest.mark.parametrize("stride", [(1, 1, 1), (2, 2, 2), (1, 2, 2)])
def test_im2col_matches_native(k, padding, stride):
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_im2col,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 9, 10, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(k, k, k, 4, 6)).astype(np.float32))
    got = conv3d_im2col(x, kernel, stride, padding)
    want = _native(x, kernel, stride, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_im2col_gradients_match():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_im2col,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 6, 7, 6, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 6, 7, 6, 5)).astype(np.float32))

    gx_t, gk_t = jax.grad(
        lambda xx, kk: jnp.sum(conv3d_im2col(xx, kk, (1, 1, 1), (1, 1, 1)) * r),
        argnums=(0, 1),
    )(x, kernel)
    gx_n, gk_n = jax.grad(
        lambda xx, kk: jnp.sum(_native(xx, kk, (1, 1, 1), (1, 1, 1)) * r),
        argnums=(0, 1),
    )(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_n), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_t), np.asarray(gk_n), rtol=1e-4, atol=1e-4)


def test_patch_matmul_matches_native():
    """stride == kernel (ViT patch embed) as one matmul."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv_patch_matmul,
    )

    rng = np.random.default_rng(5)
    for k in ((2, 2, 2), (4, 4, 4), (1, 1, 1)):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32))
        kernel = jnp.asarray(rng.normal(size=k + (3, 6)).astype(np.float32))
        got = conv_patch_matmul(x, kernel)
        want = jax.lax.conv_general_dilated(
            x, kernel, k, "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # gradients flow through the reshape/transpose formulation exactly
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(2, 2, 2, 2, 5)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 2, 2, 2, 5)).astype(np.float32))
    g_m = jax.grad(lambda kk: jnp.sum(conv_patch_matmul(x, kk) * r))(kernel)
    g_n = jax.grad(
        lambda kk: jnp.sum(
            jax.lax.conv_general_dilated(
                x, kk, (2, 2, 2), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            * r
        )
    )(kernel)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_n), rtol=1e-4, atol=1e-4)


def test_eligibility():
    assert eligible((3, 3, 3), (1, 1, 1), (1, 1, 1), 1)
    assert eligible((3, 3, 3), (2, 2, 2), (1, 1, 1), 1)
    assert not eligible((3, 3, 3), (4, 4, 4), (1, 1, 1), 1)  # csrnet _block_r
    assert eligible((3, 3, 3), (1, 1, 1), (2, 2, 2), 1)  # dilated (highresnet)
    assert eligible((3, 3, 3), (1, 1, 1), (4, 4, 4), 1)
    assert not eligible((3, 3, 3), (2, 2, 2), (2, 2, 2), 1)  # dilated + strided
    assert not eligible((3, 3, 3), (1, 1, 1), (1, 2, 2), 1)  # anisotropic dilation
    assert eligible((5, 5, 5), (1, 1, 1), (1, 1, 1), 1)  # vnet k5
    assert not eligible((3, 3, 3), (1, 1, 1), (1, 1, 1), 4)  # grouped (miniseg)
    assert not eligible((7, 7, 7), (1, 1, 1), (1, 1, 1), 1)


def test_patch_matmul_tree_matches_native(monkeypatch):
    """The k==s matmul branch must create the SAME variable tree as the
    nn.Conv fallback (checkpoints interchange across routing/env/shape)."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import TorchConv

    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    m = TorchConv(features=3, kernel_size=2, stride=2, padding=0)
    v_matmul = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("GMIST_NATIVE_CONV3D", "1")
    v_native = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_matmul) == jax.tree_util.tree_structure(
        v_native
    )
    # cross-load: native-branch weights through the matmul branch
    monkeypatch.delenv("GMIST_NATIVE_CONV3D")
    y_matmul = m.apply(v_native, x)
    monkeypatch.setenv("GMIST_NATIVE_CONV3D", "1")
    y_native = m.apply(v_native, x)
    np.testing.assert_allclose(
        np.asarray(y_matmul), np.asarray(y_native), atol=1e-5
    )


def test_torchconv_uses_decomp_and_matches_native(monkeypatch):
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import TorchConv

    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 8, 2)).astype(np.float32))
    m = TorchConv(features=4, kernel_size=3, stride=1, padding=1)
    variables = m.init(jax.random.PRNGKey(0), x)
    y_decomp = m.apply(variables, x)
    assert "kernel" in variables["params"]  # direct params = decomp path

    # native path (env kill switch) must agree using the same weights
    monkeypatch.setenv("GMIST_NATIVE_CONV3D", "1")
    native_vars = {"params": {"Conv_0": {"kernel": variables["params"]["kernel"],
                                          "bias": variables["params"]["bias"]}}}
    y_native = m.apply(native_vars, x)
    np.testing.assert_allclose(np.asarray(y_decomp), np.asarray(y_native), atol=1e-4)


def _dilated_transpose(x, kernel, stride):
    n = x.ndim - 2
    k = kernel.shape[:n]
    spatial = "DHW"[3 - n:]
    dn = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
    return jax.lax.conv_general_dilated(
        x, kernel, (1,) * n, [(ki - 1, ki - 1) for ki in k],
        lhs_dilation=tuple(stride), dimension_numbers=dn,
    )


@pytest.mark.parametrize(
    "k,stride",
    [
        ((2, 2, 2), (2, 2, 2)),    # unet up-conv (k == s)
        ((4, 4, 4), (2, 2, 2)),    # densenet head k = s + 2
        ((6, 6, 6), (4, 4, 4)),    # densenet deeper head
        ((3, 3, 3), (2, 2, 2)),    # k odd, s even
        ((2, 3, 4), (2, 2, 2)),    # anisotropic kernel
        ((4, 4, 4), (2, 2, 1)),    # anisotropic stride incl. s=1 axis
        ((1, 1, 1), (2, 2, 2)),    # k < s (zero-insertion upsample)
    ],
)
def test_phased_transpose_matches_dilated_3d(k, stride):
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv_transpose_phased,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=k + (3, 4)).astype(np.float32))
    got = conv_transpose_phased(x, kernel, stride)
    want = _dilated_transpose(x, kernel, stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_phased_transpose_matches_dilated_2d():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv_transpose_phased,
    )

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 9, 8, 3)).astype(np.float32))
    for k, s in (((4, 4), (2, 2)), ((16, 16), (8, 8)), ((3, 2), (2, 3))):
        kernel = jnp.asarray(rng.normal(size=k + (3, 2)).astype(np.float32))
        got = conv_transpose_phased(x, kernel, s)
        want = _dilated_transpose(x, kernel, s)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_phased_transpose_gradients_match():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv_transpose_phased,
    )

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 4, 5, 4, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(4, 4, 4, 2, 3)).astype(np.float32))
    s = (2, 2, 2)
    r = jnp.asarray(
        rng.normal(size=conv_transpose_phased(x, kernel, s).shape).astype(np.float32)
    )
    gx_p, gk_p = jax.grad(
        lambda xx, kk: jnp.sum(conv_transpose_phased(xx, kk, s) * r), argnums=(0, 1)
    )(x, kernel)
    gx_d, gk_d = jax.grad(
        lambda xx, kk: jnp.sum(_dilated_transpose(xx, kk, s) * r), argnums=(0, 1)
    )(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d), rtol=1e-4, atol=1e-4)


def test_torchconvtranspose_phased_routing_matches_native(monkeypatch):
    """TorchConvTranspose must produce identical output through the phased
    route and the lhs_dilation route, with the same param tree."""
    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import (
        TorchConvTranspose,
    )

    x = jnp.asarray(
        np.random.default_rng(10).normal(size=(1, 4, 4, 4, 3)).astype(np.float32)
    )
    m = TorchConvTranspose(features=2, kernel_size=4, stride=2)
    variables = m.init(jax.random.PRNGKey(0), x)
    y_phased = m.apply(variables, x)
    monkeypatch.setenv("GMIST_NATIVE_CONV3D", "1")
    y_native = m.apply(variables, x)
    assert y_phased.shape == y_native.shape
    np.testing.assert_allclose(
        np.asarray(y_phased), np.asarray(y_native), atol=1e-4
    )


@pytest.mark.parametrize("dil", [2, 4])
def test_tapgrouped_dilated_matches_native(dil):
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_tapgrouped,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 12, 11, 12, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32))
    p = (dil, dil, dil)  # HighResNet keeps sizes: padding == dilation
    got = conv3d_tapgrouped(x, kernel, (1, 1, 1), p, (dil, dil, dil))
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), tuple((pi, pi) for pi in p),
        rhs_dilation=(dil, dil, dil),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_tapgrouped_dilated_gradients_match():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_tapgrouped,
    )

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    p = ((2, 2), (2, 2), (2, 2))
    r = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 5)).astype(np.float32))
    gx_t, gk_t = jax.grad(
        lambda xx, kk: jnp.sum(
            conv3d_tapgrouped(xx, kk, (1, 1, 1), (2, 2, 2), (2, 2, 2)) * r
        ),
        argnums=(0, 1),
    )(x, kernel)
    gx_n, gk_n = jax.grad(
        lambda xx, kk: jnp.sum(
            jax.lax.conv_general_dilated(
                xx, kk, (1, 1, 1), p, rhs_dilation=(2, 2, 2),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            * r
        ),
        argnums=(0, 1),
    )(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_n), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_t), np.asarray(gk_n), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(6, 8, 10), (7, 9, 11), (5, 5, 5)])
@pytest.mark.parametrize("padding", [(1, 1, 1), (3, 3, 3), (2, 1, 4)])
@pytest.mark.parametrize("cin,cout", [(1, 8), (8, 8), (3, 16)])
def test_s2d_matches_native(shape, padding, cin, cout):
    """conv3d_s2d (space-to-depth fold) is exact vs the native conv for
    odd/even extents and the fcn3d-style large symmetric paddings."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_s2d,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1,) + shape + (cin,)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32))
    got = conv3d_s2d(x, kernel, (1, 1, 1), padding)
    want = _native(x, kernel, (1, 1, 1), padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_s2d_gradients_match():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
        conv3d_s2d,
    )

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 6, 7, 6, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 8)).astype(np.float32))

    def loss_s(k, x):
        return jnp.sum(conv3d_s2d(x, k, (1, 1, 1), (1, 1, 1)) ** 2)

    def loss_n(k, x):
        return jnp.sum(_native(x, k, (1, 1, 1), (1, 1, 1)).astype(jnp.float32) ** 2)

    gs = jax.grad(loss_s, argnums=(0, 1))(kernel, x)
    gn = jax.grad(loss_n, argnums=(0, 1))(kernel, x)
    for a, b in zip(gs, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-3)


def test_s2d_torchconv_route_param_tree(tiny_config, monkeypatch):
    """The GMIST_S2D_CONV route keeps the direct kernel/bias param tree
    and the same outputs as the default route."""
    import os

    from general_medical_image_segmentation_cnn_framework_tpu.nn.blocks import TorchConv

    rng = np.random.default_rng(9)
    # above the 200k-voxel gate: 60^3 = 216k at p=1
    x = jnp.asarray(rng.normal(size=(1, 60, 60, 60, 8)).astype(np.float32))
    m = TorchConv(features=8, kernel_size=3, padding=1)
    v = m.init(jax.random.PRNGKey(0), x)
    y_ref = m.apply(v, x)
    monkeypatch.setenv("GMIST_S2D_CONV", "1")
    m2 = TorchConv(features=8, kernel_size=3, padding=1)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    y_s2d = m2.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_ref), atol=2e-4
    )
