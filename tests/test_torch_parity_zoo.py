"""Cross-framework forward parity beyond the flagship: V-Net (k5, PReLU,
input-repeat residual) and ResidualUNet3D (InstanceNorm, LeakyReLU,
weight-sharing + pre-norm-skip quirks) transplanted into torch mirrors
built from the architecture spec (reference vnet3d.py:14-158,
residual_unet3d.py:6-205) — identical weights must give identical logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(a):
    return torch.tensor(np.ascontiguousarray(np.asarray(a, dtype=np.float32)))


def _copy_conv(tconv, kernel, bias=None):
    # flax [kd,kh,kw,in,out] -> torch [out,in,kd,kh,kw]
    tconv.weight.data = _t(np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2)))
    if bias is not None:
        tconv.bias.data = _t(bias)


def _copy_convT(tconv, kernel, bias=None):
    # flax transpose-conv kernel applies FLIPPED; torch is [in,out,kd,kh,kw]
    k = np.asarray(kernel)[::-1, ::-1, ::-1]
    tconv.weight.data = _t(np.transpose(k, (3, 4, 0, 1, 2)))
    if bias is not None:
        tconv.bias.data = _t(bias)


def _conv_kernel(scope):
    """TorchConv params: direct (decomposed path) or nested nn.Conv."""
    if "kernel" in scope:
        return scope["kernel"], scope.get("bias")
    inner = scope["Conv_0"]
    return inner["kernel"], inner.get("bias")


# ---------------------------------------------------------------------------
# V-Net
# ---------------------------------------------------------------------------


class _TorchLUConv(tnn.Module):
    def __init__(self, nchan):
        super().__init__()
        self.conv = tnn.Conv3d(nchan, nchan, 5, padding=2)
        self.bn = tnn.BatchNorm3d(nchan)
        self.act = tnn.PReLU(nchan)

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class _TorchVNet(tnn.Module):
    """Spec mirror of the reference VNet (vnet3d.py:124-158) with
    elu=False (PReLU activations)."""

    def __init__(self, cin=1, classes=2):
        super().__init__()
        self.in_conv = tnn.Conv3d(cin, 16, 5, padding=2)
        self.in_bn = tnn.BatchNorm3d(16)
        self.in_act = tnn.PReLU(16)
        self.cin = cin

        def down(inc, n):
            outc = 2 * inc
            return tnn.ModuleDict(
                {
                    "down": tnn.Conv3d(inc, outc, 2, stride=2),
                    "bn": tnn.BatchNorm3d(outc),
                    "act1": tnn.PReLU(outc),
                    "ops": tnn.ModuleList([_TorchLUConv(outc) for _ in range(n)]),
                    "act2": tnn.PReLU(outc),
                }
            )

        def up(inc, outc, n):
            return tnn.ModuleDict(
                {
                    "up": tnn.ConvTranspose3d(inc, outc // 2, 2, stride=2),
                    "bn": tnn.BatchNorm3d(outc // 2),
                    "act1": tnn.PReLU(outc // 2),
                    "ops": tnn.ModuleList([_TorchLUConv(outc) for _ in range(n)]),
                    "act2": tnn.PReLU(outc),
                }
            )

        self.d32 = down(16, 1)
        self.d64 = down(32, 2)
        self.d128 = down(64, 3)
        self.d256 = down(128, 2)
        self.u256 = up(256, 256, 2)
        self.u128 = up(256, 128, 2)
        self.u64 = up(128, 64, 1)
        self.u32 = up(64, 32, 1)
        self.out_conv = tnn.Conv3d(32, classes, 5, padding=2)
        self.out_bn = tnn.BatchNorm3d(classes)
        self.out_act = tnn.PReLU(classes)
        self.out_head = tnn.Conv3d(classes, classes, 1)

    @staticmethod
    def _down_fwd(m, x):
        d = m["act1"](m["bn"](m["down"](x)))
        o = d
        for lu in m["ops"]:
            o = lu(o)
        return m["act2"](o + d)

    @staticmethod
    def _up_fwd(m, x, skip):
        u = m["act1"](m["bn"](m["up"](x)))
        cat = torch.cat([u, skip], dim=1)
        o = cat
        for lu in m["ops"]:
            o = lu(o)
        return m["act2"](o + cat)

    def forward(self, x):
        out = self.in_bn(self.in_conv(x))
        x16 = x.repeat(1, 16 // self.cin, 1, 1, 1)
        out16 = self.in_act(out + x16)
        out32 = self._down_fwd(self.d32, out16)
        out64 = self._down_fwd(self.d64, out32)
        out128 = self._down_fwd(self.d128, out64)
        out256 = self._down_fwd(self.d256, out128)
        out = self._up_fwd(self.u256, out256, out128)
        out = self._up_fwd(self.u128, out, out64)
        out = self._up_fwd(self.u64, out, out32)
        out = self._up_fwd(self.u32, out, out16)
        out = self.out_act(self.out_bn(self.out_conv(out)))
        return self.out_head(out)


def _copy_prelu(tact, act_scope):
    tact.weight.data = _t(act_scope["PReLU_0"]["alpha"])


def test_vnet_forward_matches_torch():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.vnet3d import (
        VNet,
    )

    model = VNet(elu=False, in_channels=1, classes=2)
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=False,
    )
    p = variables["params"]

    tm = _TorchVNet(1, 2)
    tm.eval()

    # input transition
    _copy_conv(tm.in_conv, *(_conv_kernel(p["TorchConv_0"])))
    _copy_prelu(tm.in_act, p["_Act_0"])

    # down transitions: TorchConv_{1..4} (k2 s2 -> nested Conv_0),
    # _NConvs_{0..3}, acts in call order
    act_i = 1
    for ti, (m, n_convs) in enumerate(
        [(tm.d32, 1), (tm.d64, 2), (tm.d128, 3), (tm.d256, 2)]
    ):
        _copy_conv(m["down"], *(_conv_kernel(p[f"TorchConv_{ti + 1}"])))
        _copy_prelu(m["act1"], p[f"_Act_{act_i}"])
        act_i += 1
        nc = p[f"_NConvs_{ti}"]
        for j in range(n_convs):
            lu = nc[f"_LUConv_{j}"]
            _copy_conv(m["ops"][j].conv, *(_conv_kernel(lu["TorchConv_0"])))
            _copy_prelu(m["ops"][j].act, lu["_Act_0"])
        _copy_prelu(m["act2"], p[f"_Act_{act_i}"])
        act_i += 1

    for ti, (m, n_convs) in enumerate(
        [(tm.u256, 2), (tm.u128, 2), (tm.u64, 1), (tm.u32, 1)]
    ):
        up_scope = p[f"TorchConvTranspose_{ti}"]
        _copy_convT(m["up"], up_scope["kernel"], up_scope.get("bias"))
        _copy_prelu(m["act1"], p[f"_Act_{act_i}"])
        act_i += 1
        nc = p[f"_NConvs_{ti + 4}"]
        for j in range(n_convs):
            lu = nc[f"_LUConv_{j}"]
            _copy_conv(m["ops"][j].conv, *(_conv_kernel(lu["TorchConv_0"])))
            _copy_prelu(m["ops"][j].act, lu["_Act_0"])
        _copy_prelu(m["act2"], p[f"_Act_{act_i}"])
        act_i += 1

    _copy_conv(tm.out_conv, *(_conv_kernel(p["TorchConv_5"])))
    _copy_prelu(tm.out_act, p[f"_Act_{act_i}"])
    _copy_conv(tm.out_head, *(_conv_kernel(p["TorchConv_6"])))

    y_flax = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        y_torch = tm(_t(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    y_torch = np.transpose(y_torch, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(y_flax, y_torch, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Residual U-Net (InstanceNorm / LeakyReLU / weight-sharing quirks)
# ---------------------------------------------------------------------------


def test_residual_unet3d_forward_matches_torch():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.residual_unet3d import (
        ResidualUNet3D,
    )

    f = 4
    model = ResidualUNet3D(in_channels=1, n_classes=2, base_n_filter=f)
    # 32^3 keeps the level-5 bottleneck at 2^3 spatial (InstanceNorm is
    # degenerate at 1^3)
    x = np.random.default_rng(1).normal(size=(1, 32, 32, 32, 1)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=False,
    )
    p = variables["params"]

    inorm = tnn.InstanceNorm3d(1, eps=1e-5)  # channel count irrelevant (no affine)
    inorm.eval()
    lrelu = tnn.LeakyReLU(0.01)
    up2 = lambda t: tnn.functional.interpolate(t, scale_factor=2, mode="nearest")

    def conv_of(scope_name):
        k, _ = _conv_kernel(p[scope_name])
        k = np.asarray(k)
        cout, cin = k.shape[4], k.shape[3]
        stride = 1
        layer = tnn.Conv3d(cin, cout, k.shape[0], stride=stride, bias=False,
                           padding=(k.shape[0] - 1) // 2)
        _copy_conv(layer, k)
        return layer

    def conv_s2_of(scope_name):
        k, _ = _conv_kernel(p[scope_name])
        k = np.asarray(k)
        layer = tnn.Conv3d(k.shape[3], k.shape[4], 3, stride=2, bias=False, padding=1)
        _copy_conv(layer, k)
        return layer

    def nlc_of(scope_name):
        """shared norm_lrelu_conv block"""
        k, _ = _conv_kernel(p[scope_name]["TorchConv_0"])
        layer = conv_layer = tnn.Conv3d(
            np.asarray(k).shape[3], np.asarray(k).shape[4], 3, padding=1, bias=False
        )
        _copy_conv(conv_layer, k)
        return lambda t: layer(lrelu(inorm(t)))

    def cnl_of(scope_name):
        k, _ = _conv_kernel(p[scope_name]["TorchConv_0"])
        layer = tnn.Conv3d(np.asarray(k).shape[3], np.asarray(k).shape[4], 3,
                           padding=1, bias=False)
        _copy_conv(layer, k)
        return lambda t: lrelu(inorm(layer(t)))

    def nluc_of(scope_name):
        k, _ = _conv_kernel(p[scope_name]["TorchConv_0"])
        layer = tnn.Conv3d(np.asarray(k).shape[3], np.asarray(k).shape[4], 3,
                           padding=1, bias=False)
        _copy_conv(layer, k)
        return lambda t: lrelu(inorm(layer(up2(lrelu(inorm(t))))))

    c = {i: f"TorchConv_{i}" for i in range(14)}

    with torch.no_grad():
        t = _t(np.transpose(x, (0, 4, 1, 2, 3)))
        out = conv_of(c[0])(t)
        residual_1 = out
        out = conv_of(c[1])(lrelu(out))
        out = conv_of(c[2])(lrelu(out))
        out = out + residual_1
        context_1 = lrelu(out)
        out = lrelu(inorm(out))

        contexts = []
        for level in range(3):
            out = conv_s2_of(c[3 + level])(out)
            residual = out
            shared = nlc_of(f"_NormLReluConv_{level}")
            out = shared(shared(out))
            out = lrelu(inorm(out + residual))
            contexts.append(out)
        context_2, context_3, context_4 = contexts

        out = conv_s2_of(c[6])(out)
        residual_5 = out
        shared5 = nlc_of("_NormLReluConv_3")
        out = shared5(shared5(out)) + residual_5
        out = nluc_of("_NormLReluUpscaleConvNormLRelu_0")(out)

        out = lrelu(inorm(conv_of(c[7])(out)))

        out = torch.cat([out, context_4], dim=1)
        out = cnl_of("_ConvNormLRelu_0")(out)
        out = conv_of(c[8])(out)
        out = nluc_of("_NormLReluUpscaleConvNormLRelu_1")(out)

        out = torch.cat([out, context_3], dim=1)
        out = cnl_of("_ConvNormLRelu_1")(out)
        ds2 = out
        out = conv_of(c[9])(out)
        out = nluc_of("_NormLReluUpscaleConvNormLRelu_2")(out)

        out = torch.cat([out, context_2], dim=1)
        out = cnl_of("_ConvNormLRelu_2")(out)
        ds3 = out
        out = conv_of(c[10])(out)
        out = nluc_of("_NormLReluUpscaleConvNormLRelu_3")(out)

        out = torch.cat([out, context_1], dim=1)
        out = cnl_of("_ConvNormLRelu_3")(out)
        out_pred = conv_of(c[11])(out)

        ds2_up = up2(conv_of(c[12])(ds2))
        ds_sum_up = up2(ds2_up + conv_of(c[13])(ds3))
        y_torch = (out_pred + ds_sum_up).numpy()

    y_flax = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    y_torch = np.transpose(y_torch, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(y_flax, y_torch, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# UNETR transformer block (reference unetr.py:54-125)
# ---------------------------------------------------------------------------


def _copy_dense(tlin, scope):
    tlin.weight.data = _t(np.asarray(scope["kernel"]).T)
    if "bias" in scope:
        tlin.bias.data = _t(scope["bias"])


def test_unetr_transformer_block_matches_torch():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unetr import (
        _TransformerBlock,
    )

    dim, heads, n = 96, 8, 24
    block = _TransformerBlock(embed_dim=dim, num_heads=heads, dropout=0.1)
    x = np.random.default_rng(2).normal(size=(2, n, dim)).astype(np.float32)
    variables = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=False,
    )
    p = variables["params"]

    ln1 = tnn.LayerNorm(dim, eps=1e-6)
    ln2 = tnn.LayerNorm(dim, eps=1e-6)
    wq, wk, wv, wo = (tnn.Linear(dim, dim) for _ in range(4))
    fc1, fc2 = tnn.Linear(dim, 2048), tnn.Linear(2048, dim)
    ln1.weight.data = _t(p["LayerNorm_0"]["scale"])
    ln1.bias.data = _t(p["LayerNorm_0"]["bias"])
    ln2.weight.data = _t(p["LayerNorm_1"]["scale"])
    ln2.bias.data = _t(p["LayerNorm_1"]["bias"])
    att = p["_SelfAttention_0"]
    for lin, name in ((wq, "Dense_0"), (wk, "Dense_1"), (wv, "Dense_2"), (wo, "Dense_3")):
        _copy_dense(lin, att[name])
    _copy_dense(fc1, p["Dense_0"])
    _copy_dense(fc2, p["Dense_1"])

    hd = dim // heads
    with torch.no_grad():
        t = _t(x)
        h = t
        y = ln1(t)
        b = y.shape[0]
        q = wq(y).reshape(b, n, heads, hd).permute(0, 2, 1, 3)
        k = wk(y).reshape(b, n, heads, hd).permute(0, 2, 1, 3)
        v = wv(y).reshape(b, n, heads, hd).permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-2, -1) / np.sqrt(hd), dim=-1)
        ctx = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, dim)
        t = wo(ctx) + h
        h = t
        y = ln2(t)
        y = fc2(torch.relu(fc1(y)))
        y_torch = (y + h).numpy()

    y_flax = np.asarray(block.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(y_flax, y_torch, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# VT-UNet window attention (reference vt_unet.py:124-229, incl. the
# double-scaled decoder query quirk at :214)
# ---------------------------------------------------------------------------


def test_vtunet_window_attention_matches_torch():
    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.vt_unet import (
        WindowAttention3D,
        _relative_position_index,
    )

    dim, heads, ws = 48, 6, (2, 3, 4)
    n = int(np.prod(ws))
    attn_mod = WindowAttention3D(dim=dim, window_size=ws, num_heads=heads)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, n, dim)).astype(np.float32)
    x2 = rng.normal(size=(4, n, dim)).astype(np.float32)
    variables = attn_mod.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=False,
    )
    p = variables["params"]

    # flax: encoder pass caches (v, k, q); decoder pass cross-attends
    _, _, v_c, k_c, q_c = attn_mod.apply(variables, jnp.asarray(x2), train=False)
    out, out2, _, _, _ = attn_mod.apply(
        variables, jnp.asarray(x), prev=(v_c, k_c, q_c), train=False
    )

    qkv = tnn.Linear(dim, dim * 3)
    proj = tnn.Linear(dim, dim)
    _copy_dense(qkv, p["Dense_0"])
    _copy_dense(proj, p["Dense_1"])
    table = _t(p["relative_position_bias_table"])
    rel_index = torch.tensor(_relative_position_index(ws).reshape(-1))
    hd = dim // heads
    scale = hd ** -0.5

    def split_qkv(t):
        b_ = t.shape[0]
        z = qkv(t).reshape(b_, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        return z[0], z[1], z[2]

    rel_bias = table[rel_index].reshape(n, n, heads).permute(2, 0, 1)[None]

    def attend(q, k, v):
        a = torch.softmax(q @ k.transpose(-2, -1) + rel_bias, dim=-1)
        o = (a @ v).permute(0, 2, 1, 3).reshape(v.shape[0], n, dim)
        return proj(o)

    with torch.no_grad():
        q, k, v = split_qkv(_t(x))
        q = q * scale
        t_out = attend(q, k, v)
        q2, k2, v2 = split_qkv(_t(x2))
        q2 = q2 * scale  # cache holds the once-scaled encoder query
        # decoder double-scales its own query against the cached k/v (:214)
        t_out2 = attend(q * scale, k2, v2)

    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out2), t_out2.numpy(), atol=5e-5, rtol=1e-4)
