"""Direct-oracle forward parity against the reference's OWN torch code.

Unlike tests/test_torch_parity*.py (which transplant into torch *mirrors*
written from a reading of the reference), these tests import the actual
reference model classes from the read-only snapshot at /root/reference,
randomize their weights AND BatchNorm running statistics, transplant the
state into the Flax zoo, and assert fp32 logits parity. A misread
architecture quirk cannot pass here: the oracle is upstream's executable
source itself.

Covered — 22 direct oracles, every reference model:
3-D: unet3d, csrnet, IS, densevoxelnet3d, densenet3d, highresnet, vnet3d,
residual_unet3d, ER_net, RE_net, unetr (whole model), fcn3d, Double_Unet,
FusionNet (the last two via import stubs for their unused
torchvision/thop imports), vt_unet (whole model at the real 128^3
geometry, mmcv import stubbed; block-level mirrors also live in
test_torch_parity_zoo.py)
2-D: unet, segnet, deeplab, pspnet, miniseg, fcn (FCN32s, `fcn`-package
import stubbed), unetpp (reference decoder vs a faithful public-resnet34
encoder stub)
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference snapshot not available"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def ref_module(name):
    """Import a reference model module (e.g. 'three_d.unet3d')."""
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    return importlib.import_module(f"models.{name}")


# ---------------------------------------------------------------------------
# torch -> flax weight conversion helpers
# ---------------------------------------------------------------------------


def f_conv(tconv):
    """torch Conv3d weight [out,in,kd,kh,kw] -> flax [kd,kh,kw,in,out]."""
    w = tconv.weight.detach().numpy()
    nd = w.ndim - 2
    out = {"kernel": np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))}
    if tconv.bias is not None:
        out["bias"] = tconv.bias.detach().numpy()
    return out


def f_convT(tconv):
    """torch ConvTranspose weight [in,out,kd,kh,kw] -> flax transpose-conv
    kernel (which flax applies FLIPPED): transpose then flip spatial."""
    w = tconv.weight.detach().numpy()
    nd = w.ndim - 2
    k = np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))
    k = k[(slice(None, None, -1),) * nd]
    out = {"kernel": np.ascontiguousarray(k)}
    if tconv.bias is not None:
        out["bias"] = tconv.bias.detach().numpy()
    return out


def f_norm_params(tbn):
    return {
        "scale": tbn.weight.detach().numpy(),
        "bias": tbn.bias.detach().numpy(),
    }


def f_norm_stats(tbn):
    return {
        "mean": tbn.running_mean.detach().numpy(),
        "var": tbn.running_var.detach().numpy(),
    }


def f_linear(tlin):
    out = {"kernel": tlin.weight.detach().numpy().T}
    if tlin.bias is not None:
        out["bias"] = tlin.bias.detach().numpy()
    return out


def f_prelu(tact):
    return np.squeeze(tact.weight.detach().numpy())


def randomize(tmodel, seed=0, scale=0.15):
    """Randomize every parameter AND BN running stat of a torch model so the
    transplant cannot pass via default-init coincidences. ``scale`` keeps
    activations bounded for deep norm-free nets (fp32 noise scales with the
    activation magnitude, not with the architecture difference)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * scale)
        for m in tmodel.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
    tmodel.eval()
    return tmodel


def run_torch(tmodel, x_nchw):
    with torch.no_grad():
        y = tmodel(torch.tensor(x_nchw))
    return y


def to_channels_last(x_nchw):
    nd = x_nchw.ndim
    return np.transpose(x_nchw, (0,) + tuple(range(2, nd)) + (1,))


def to_channels_first(y_channels_last):
    nd = y_channels_last.ndim
    return np.transpose(y_channels_last, (0, nd - 1) + tuple(range(1, nd - 1)))


def assert_close(flax_out, torch_out, atol=2e-4, rtol=2e-3):
    np.testing.assert_allclose(
        np.asarray(flax_out), to_channels_last(torch_out.numpy()),
        atol=atol, rtol=rtol,
    )


def _conv_scope(scope):
    """Flax TorchConv params live either directly or under a Conv_0 child."""
    return scope["Conv_0"] if "Conv_0" in scope and "kernel" not in scope else scope


def set_conv(params, name, tconv):
    dst = _conv_scope(params[name])
    for k, v in f_conv(tconv).items():
        dst[k] = jnp.asarray(v)


def set_convT(params, name, tconv):
    dst = _conv_scope(params[name])
    for k, v in f_convT(tconv).items():
        dst[k] = jnp.asarray(v)


def set_norm(params, stats, name, tbn):
    for k, v in f_norm_params(tbn).items():
        params[name][k] = jnp.asarray(v)
    if stats is not None and name in stats:
        for k, v in f_norm_stats(tbn).items():
            stats[name][k] = jnp.asarray(v)


def unfreeze(variables):
    """Plain mutable dict copy of a (possibly frozen) variable tree."""
    import flax

    return flax.core.unfreeze(
        jax.tree_util.tree_map(lambda a: a, variables)
    )


# ---------------------------------------------------------------------------
# unet3d — reference models/three_d/unet3d.py:9-104
# ---------------------------------------------------------------------------


def test_unet3d_oracle():
    mod = ref_module("three_d.unet3d")
    tm = randomize(mod.UNet3D(in_channels=1, out_channels=2, init_features=4))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (
        UNet3D,
    )

    model = UNet3D(in_channels=1, out_channels=2, init_features=4)
    x = np.random.default_rng(0).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    blocks = [tm.encoder1, tm.encoder2, tm.encoder3, tm.encoder4, tm.bottleneck,
              tm.decoder4, tm.decoder3, tm.decoder2, tm.decoder1]
    names = ["enc1", "enc2", "enc3", "enc4", "bottleneck",
             "dec4", "dec3", "dec2", "dec1"]
    i = 0
    for blk, nm in zip(blocks, names):
        for j in (1, 2):
            scope, sscope = params[f"ConvBlock_{i}"], stats[f"ConvBlock_{i}"]
            set_conv(scope, "TorchConv_0", getattr(blk, f"{nm}conv{j}"))
            set_norm(scope, sscope, "BatchNorm_0", getattr(blk, f"{nm}norm{j}"))
            i += 1
    for k, up in enumerate([tm.upconv4, tm.upconv3, tm.upconv2, tm.upconv1]):
        set_convT(params, f"TorchConvTranspose_{k}", up)
    set_conv(params, "Conv_0", tm.conv)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x))


# ---------------------------------------------------------------------------
# csrnet — reference models/three_d/csrnet.py:4-154 (cross-scale residuals)
# ---------------------------------------------------------------------------


def test_csrnet_oracle():
    mod = ref_module("three_d.csrnet")
    tm = randomize(mod.CSRNet(in_channels=1, out_channels=2, init_features=4))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.csrnet import (
        CSRNet,
    )

    model = CSRNet(in_channels=1, out_channels=2, init_features=4)
    x = np.random.default_rng(1).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    def put_block(cb_i, tblock, nm):
        for j, cb in zip((1, 2), (f"ConvBlock_{cb_i}", f"ConvBlock_{cb_i+1}")):
            set_conv(params[cb], "TorchConv_0", getattr(tblock, f"{nm}conv{j}"))
            set_norm(params[cb], stats[cb], "BatchNorm_0", getattr(tblock, f"{nm}norm{j}"))

    def put_r(conv_i, bn_i, tblock, nm, transpose=False):
        if transpose:
            set_convT(params, f"TorchConvTranspose_{conv_i}", getattr(tblock, f"{nm}conv1"))
        else:
            set_conv(params, f"TorchConv_{conv_i}", getattr(tblock, f"{nm}conv1"))
        set_norm(params, stats, f"BatchNorm_{bn_i}", getattr(tblock, f"{nm}norm1"))

    put_block(0, tm.encoder1, "enc1")
    put_block(2, tm.encoder2, "enc2")
    put_block(4, tm.encoder3, "enc3")
    put_r(0, 0, tm.encoder_r_1, "enc1_r")
    put_block(6, tm.encoder4, "enc4")
    put_r(1, 1, tm.encoder_r_2, "enc2_r")
    put_block(8, tm.bottleneck, "bottleneck")
    put_r(2, 2, tm.encoder_r_3, "enc3_r")
    set_convT(params, "TorchConvTranspose_0", tm.upconv4)
    put_block(10, tm.decoder4, "dec4")
    set_convT(params, "TorchConvTranspose_1", tm.upconv3)
    put_r(2, 3, tm.dncoder_r_1, "dnc1_r", transpose=True)
    put_block(12, tm.decoder3, "dec3")
    set_convT(params, "TorchConvTranspose_3", tm.upconv2)
    put_r(4, 4, tm.dncoder_r_2, "dnc2_r", transpose=True)
    put_block(14, tm.decoder2, "dec2")
    set_convT(params, "TorchConvTranspose_5", tm.upconv1)
    put_r(6, 5, tm.dncoder_r_3, "dnc3_r", transpose=True)
    put_block(16, tm.decoder1, "dec1")
    set_conv(params, "TorchConv_3", tm.conv)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x))


# ---------------------------------------------------------------------------
# IS — reference models/three_d/IS.py:6-214 (shared encoder, 3 decoders,
# out1 = conv(dec1), out2 = conv_(dec1+dec1_+dec1__); FFT band-split inputs)
# ---------------------------------------------------------------------------


def test_is_oracle():
    mod = ref_module("three_d.IS")
    tm = randomize(mod.UNet3D(in_channels=1, out_channels=2, init_features=4))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.is_net import (
        ISNet,
    )

    model = ISNet(in_channels=1, out_channels=2, init_features=4)
    rng = np.random.default_rng(2)
    xs = [rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32) for _ in range(3)]
    zs = [jnp.asarray(to_channels_last(a)) for a in xs]
    variables = unfreeze(model.init(jax.random.PRNGKey(0), *zs, train=False))
    params, stats = variables["params"], variables["batch_stats"]

    # shared encoder: enc1..enc4 + bottleneck = ConvBlock_0..9
    enc_blocks = [tm.encoder1, tm.encoder2, tm.encoder3, tm.encoder4, tm.bottleneck]
    enc_names = ["enc1", "enc2", "enc3", "enc4", "bottleneck"]
    ep, es = params["_Encoder_0"], stats["_Encoder_0"]
    i = 0
    for blk, nm in zip(enc_blocks, enc_names):
        for j in (1, 2):
            set_conv(ep[f"ConvBlock_{i}"], "TorchConv_0", getattr(blk, f"{nm}conv{j}"))
            set_norm(ep[f"ConvBlock_{i}"], es[f"ConvBlock_{i}"], "BatchNorm_0",
                     getattr(blk, f"{nm}norm{j}"))
            i += 1

    # three decoder weight sets: plain, "_", "__"
    for di, suffix in enumerate(["", "_", "__"]):
        dp, ds = params[f"_Decoder_{di}"], stats[f"_Decoder_{di}"]
        ups = [getattr(tm, f"upconv{k}{suffix}") for k in (4, 3, 2, 1)]
        decs = [getattr(tm, f"decoder{k}{suffix}") for k in (4, 3, 2, 1)]
        nms = ["dec4", "dec3", "dec2", "dec1"]
        cb = 0
        for k, (up, dblk, nm) in enumerate(zip(ups, decs, nms)):
            set_convT(dp, f"TorchConvTranspose_{k}", up)
            for j in (1, 2):
                set_conv(dp[f"ConvBlock_{cb}"], "TorchConv_0", getattr(dblk, f"{nm}conv{j}"))
                set_norm(dp[f"ConvBlock_{cb}"], ds[f"ConvBlock_{cb}"], "BatchNorm_0",
                         getattr(dblk, f"{nm}norm{j}"))
                cb += 1

    set_conv(params, "TorchConv_0", tm.conv)
    set_conv(params, "TorchConv_1", tm.conv_)

    out1, out2 = model.apply(variables, *zs, train=False)
    with torch.no_grad():
        t1, t2 = tm(*[torch.tensor(a) for a in xs])
    assert_close(out1, t1)
    assert_close(out2, t2)


# ---------------------------------------------------------------------------
# densevoxelnet — reference models/three_d/densevoxelnet3d.py:90-129
# (returns the AUXILIARY head y2 — quirk preserved)
# ---------------------------------------------------------------------------


def test_densevoxelnet_oracle():
    mod = ref_module("three_d.densevoxelnet3d")
    tm = randomize(mod.DenseVoxelNet(in_channels=1, classes=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.densevoxelnet3d import (
        DenseVoxelNet,
    )

    model = DenseVoxelNet(in_channels=1, classes=2)
    x = np.random.default_rng(3).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    set_conv(params, "TorchConv_0", tm.conv_init)
    for bi, dense in enumerate([tm.dense_1, tm.dense_2]):
        for li in range(12):
            tl = getattr(dense, f"denselayer{li + 1}")
            scope = f"_DenseLayer_{bi * 12 + li}"
            set_norm(params[scope], stats[scope], "BatchNorm_0", tl.norm1)
            set_conv(params[scope], "TorchConv_0", tl.conv1)
    # transition: BN -> ReLU -> conv1 (Sequential [norm, relu, conv3d])
    set_norm(params, stats, "BatchNorm_0", tm.trans.conv[0])
    set_conv(params, "TorchConv_1", tm.trans.conv[2])
    # up block
    set_norm(params, stats, "BatchNorm_1", tm.up_block.norm)
    set_conv(params, "TorchConv_2", tm.up_block.conv)
    set_convT(params, "TorchConvTranspose_0", tm.up_block.transp_conv_1)
    set_convT(params, "TorchConvTranspose_1", tm.up_block.transp_conv_2)
    set_conv(params, "TorchConv_3", tm.conv_final)
    set_convT(params, "TorchConvTranspose_2", tm.transpose)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x))


# ---------------------------------------------------------------------------
# er_net — reference models/three_d/ER_net.py:155-231 (reverse-attention
# gates + SK-style selective-fusion decoders)
# ---------------------------------------------------------------------------


def _put_res_encoder(params, stats, scope, tenc):
    """flax ResEncoder/ResDecoder scope: TorchConv_0=conv1x1 residual,
    TorchConv_1/BatchNorm_0=conv1/bn1, TorchConv_2/BatchNorm_1=conv2/bn2."""
    set_conv(params[scope], "TorchConv_0", tenc.conv1x1)
    set_conv(params[scope], "TorchConv_1", tenc.conv1)
    set_norm(params[scope], stats[scope], "BatchNorm_0", tenc.bn1)
    set_conv(params[scope], "TorchConv_2", tenc.conv2)
    set_norm(params[scope], stats[scope], "BatchNorm_1", tenc.bn2)


def test_er_net_oracle():
    mod = ref_module("three_d.ER_net")
    tm = randomize(mod.ER_Net(classes=2, channels=1))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.er_net import (
        ERNet,
    )

    model = ERNet(classes=2, channels=1)
    x = np.random.default_rng(4).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    for i, tenc in enumerate([tm.encoder1, tm.encoder2, tm.encoder3, tm.bridge]):
        _put_res_encoder(params, stats, f"ResEncoder_{i}", tenc)

    # reverse-attention gates in flax call order: (conv3_3,convTrans3),
    # (conv2_2,convTrans2), (conv1_1,convTrans1)
    gates = [(tm.conv3_3, tm.convTrans3), (tm.conv2_2, tm.convTrans2),
             (tm.conv1_1, tm.convTrans1)]
    for i, (c, t) in enumerate(gates):
        set_conv(params, f"TorchConv_{i}", c)
        set_convT(params, f"TorchConvTranspose_{i}", t)

    for i, up in enumerate([tm.up3, tm.up2, tm.up1]):
        set_convT(params, f"TorchConvTranspose_{i + 3}", up)

    for i, tdec in enumerate([tm.decoder3, tm.decoder2, tm.decoder1]):
        scope = f"SFDecoder_{i}"
        sf = params[scope]["SFConv_0"]
        for k, v in f_linear(tdec.conv1.fc).items():
            sf["Dense_0"][k] = jnp.asarray(v)
        for j, fc in enumerate(tdec.conv1.fcs):
            for k, v in f_linear(fc).items():
                sf[f"Dense_{j + 1}"][k] = jnp.asarray(v)
        set_norm(params[scope], stats[scope], "BatchNorm_0", tdec.bn1)
        rd = tdec.ResDecoder
        set_conv(params[scope], "TorchConv_0", rd.conv1x1)
        set_conv(params[scope], "TorchConv_1", rd.conv1)
        set_norm(params[scope], stats[scope], "BatchNorm_1", rd.bn1)
        set_conv(params[scope], "TorchConv_2", rd.conv2)
        set_norm(params[scope], stats[scope], "BatchNorm_2", rd.bn2)

    set_conv(params, "TorchConv_3", tm.final)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x))


# ---------------------------------------------------------------------------
# re_net — reference models/three_d/RE_net.py:79-158 (1-in/2-out hardcoded,
# final sigmoid — quirks preserved)
# ---------------------------------------------------------------------------


def test_re_net_oracle():
    mod = ref_module("three_d.RE_net")
    tm = randomize(mod.RE_Net())

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.re_net import (
        RENet,
    )

    model = RENet()
    x = np.random.default_rng(5).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    for i, tenc in enumerate([tm.encoder1, tm.encoder2, tm.encoder3, tm.bridge]):
        _put_res_encoder(params, stats, f"ResEncoder_{i}", tenc)

    gates = [(tm.conv3_3, tm.convTrans3), (tm.conv2_2, tm.convTrans2),
             (tm.conv1_1, tm.convTrans1)]
    for i, (c, t) in enumerate(gates):
        set_conv(params, f"TorchConv_{i}", c)
        set_convT(params, f"TorchConvTranspose_{i}", t)

    for i, up in enumerate([tm.up3, tm.up2, tm.up1]):
        set_convT(params, f"TorchConvTranspose_{i + 3}", up)

    # plain decoders: Sequential(conv, bn, relu, conv, bn, relu)
    ci, bi = 3, 0
    for tdec in [tm.decoder3, tm.decoder2, tm.decoder1]:
        for conv_m, bn_m in ((tdec.conv[0], tdec.conv[1]), (tdec.conv[3], tdec.conv[4])):
            set_conv(params, f"TorchConv_{ci}", conv_m)
            set_norm(params, stats, f"BatchNorm_{bi}", bn_m)
            ci += 1
            bi += 1
    set_conv(params, f"TorchConv_{ci}", tm.final)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=1e-5, rtol=1e-4)  # post-sigmoid


# ---------------------------------------------------------------------------
# highresnet — reference models/three_d/highresnet.py:13-143 +
# utils/{convolution,residual,dilation}.py (shared L3 blocks)
# ---------------------------------------------------------------------------


def test_highresnet_oracle():
    mod = ref_module("three_d.highresnet")
    tm = randomize(
        mod.HighRes3DNet(in_channels=1, out_channels=2, initial_out_channels_power=2)
    )

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.highresnet import (
        HighRes3DNet,
    )

    model = HighRes3DNet(in_channels=1, out_channels=2, initial_out_channels_power=2)
    x = np.random.default_rng(6).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    def put_cblock(pscope, sscope, tcb, preactivation):
        seq = tcb.convolutional_block
        mods = list(seq)
        convs = [m for m in mods if isinstance(m, torch.nn.Conv3d)]
        norms = [m for m in mods if isinstance(m, torch.nn.BatchNorm3d)]
        set_conv(pscope, "TorchConv_0", convs[0])
        set_norm(pscope, sscope, "BatchNorm_0", norms[0])

    # stem (post-activation)
    put_cblock(params["ConvolutionalBlock_0"], stats["ConvolutionalBlock_0"],
               tm.block[0], False)
    # 3 dilation stages x 3 residual blocks x 2 conv blocks (pre-activation)
    for d in range(3):
        tdil = tm.block[1 + d]
        for r in range(3):
            trb = tdil.dilation_block[r]
            for c in range(2):
                scope = (params[f"DilationBlock_{d}"][f"ResidualBlock_{r}"]
                         [f"ConvolutionalBlock_{c}"])
                sscope = (stats[f"DilationBlock_{d}"][f"ResidualBlock_{r}"]
                          [f"ConvolutionalBlock_{c}"])
                put_cblock(scope, sscope, trb.residual_block[c], True)
    # classifier
    put_cblock(params["ConvolutionalBlock_1"], stats["ConvolutionalBlock_1"],
               tm.block[4], False)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x))

    # receptive_field property parity (reference highresnet.py:119-132)
    assert int(model.receptive_field) == int(tm.receptive_field)


# ---------------------------------------------------------------------------
# densenet — reference models/three_d/densenet3d.py:51-160 (SkipDenseNet3D:
# stem skip, 4 dense blocks, grouped-ConvTranspose upsampling heads)
# ---------------------------------------------------------------------------


def test_densenet_oracle():
    mod = ref_module("three_d.densenet3d")
    kwargs = dict(in_channels=1, classes=2, growth_rate=4,
                  block_config=(2, 2, 2, 2), num_init_features=8, bn_size=2)
    tm = randomize(mod.SkipDenseNet3D(drop_rate=0.1, **kwargs))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.densenet3d import (
        SkipDenseNet3D,
    )

    model = SkipDenseNet3D(**kwargs)
    x = np.random.default_rng(7).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    # stem: conv0/norm0, conv1/norm1, conv2 | features_bn norm2 | pool conv
    fs = tm.features
    set_conv(params, "TorchConv_0", fs.conv0)
    set_norm(params, stats, "BatchNorm_0", fs.norm0)
    set_conv(params, "TorchConv_1", fs.conv1)
    set_norm(params, stats, "BatchNorm_1", fs.norm1)
    set_conv(params, "TorchConv_2", fs.conv2)
    set_norm(params, stats, "BatchNorm_2", tm.features_bn.norm2)
    set_conv(params, "TorchConv_3", tm.conv_pool_first)

    def put_grouped_convT(gscope, tconv, groups):
        w = tconv.weight.detach().numpy()  # [in, out_per, k, k, k]
        in_per = w.shape[0] // groups
        for g in range(groups):
            wg = w[g * in_per : (g + 1) * in_per]
            k = np.transpose(wg, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1]
            gscope[f"TorchConvTranspose_{g}"]["kernel"] = jnp.asarray(
                np.ascontiguousarray(k)
            )

    dl = 0
    conv_i, bn_i = 4, 3
    for b in range(4):
        tblock = tm.dense_blocks[b]
        for li in range(2):
            tl = getattr(tblock, f"denselayer{li + 1}")
            scope, sscope = params[f"_DenseLayer_{dl}"], stats[f"_DenseLayer_{dl}"]
            set_norm(scope, sscope, "BatchNorm_0", tl.norm1)
            set_conv(scope, "TorchConv_0", tl.conv1)
            set_norm(scope, sscope, "BatchNorm_1", tl.norm2)
            set_conv(scope, "TorchConv_1", tl.conv2)
            dl += 1
        put_grouped_convT(params[f"_GroupedConvTranspose_{b}"],
                          tm.upsampling_blocks[b], groups=2)
        if b != 3:
            tt = tm.transit_blocks[b]
            set_norm(params, stats, f"BatchNorm_{bn_i}", tt.norm)
            set_conv(params, f"TorchConv_{conv_i}", tt.conv)
            set_norm(params, stats, f"BatchNorm_{bn_i + 1}", tt.pool_norm)
            set_conv(params, f"TorchConv_{conv_i + 1}", tt.pool)
            conv_i += 2
            bn_i += 2

    set_norm(params, stats, f"BatchNorm_{bn_i}", tm.bn_class)
    set_conv(params, f"TorchConv_{conv_i}", tm.conv_class)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x))


# ---------------------------------------------------------------------------
# vnet — reference models/three_d/vnet3d.py:124-158 (k5/PReLU/input-repeat/
# transition residuals), elu=False for the parameterized PReLU path
# ---------------------------------------------------------------------------


def set_prelu(params, scope, tact):
    params[scope]["PReLU_0"]["alpha"] = jnp.asarray(f_prelu(tact))


def test_vnet_oracle():
    mod = ref_module("three_d.vnet3d")
    tm = randomize(mod.VNet(elu=False, in_channels=1, classes=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.vnet3d import (
        VNet,
    )

    model = VNet(elu=False, in_channels=1, classes=2)
    x = np.random.default_rng(8).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    # input transition
    set_conv(params, "TorchConv_0", tm.in_tr.conv1)
    set_norm(params, stats, "BatchNorm_0", tm.in_tr.bn1)
    set_prelu(params, "_Act_0", tm.in_tr.relu1)

    act_i, bn_i = 1, 1
    downs = [(tm.down_tr32, 1), (tm.down_tr64, 2), (tm.down_tr128, 3), (tm.down_tr256, 2)]
    for ti, (m, n_convs) in enumerate(downs):
        set_conv(params, f"TorchConv_{ti + 1}", m.down_conv)
        set_norm(params, stats, f"BatchNorm_{bn_i}", m.bn1)
        bn_i += 1
        set_prelu(params, f"_Act_{act_i}", m.relu1)
        act_i += 1
        for j in range(n_convs):
            lu = m.ops[j]
            nc, ns = params[f"_NConvs_{ti}"][f"_LUConv_{j}"], stats[f"_NConvs_{ti}"][f"_LUConv_{j}"]
            set_conv(nc, "TorchConv_0", lu.conv1)
            set_norm(nc, ns, "BatchNorm_0", lu.bn1)
            set_prelu(nc, "_Act_0", lu.relu1)
        set_prelu(params, f"_Act_{act_i}", m.relu2)
        act_i += 1

    ups = [(tm.up_tr256, 2), (tm.up_tr128, 2), (tm.up_tr64, 1), (tm.up_tr32, 1)]
    for ti, (m, n_convs) in enumerate(ups):
        set_convT(params, f"TorchConvTranspose_{ti}", m.up_conv)
        set_norm(params, stats, f"BatchNorm_{bn_i}", m.bn1)
        bn_i += 1
        set_prelu(params, f"_Act_{act_i}", m.relu1)
        act_i += 1
        for j in range(n_convs):
            lu = m.ops[j]
            nc = params[f"_NConvs_{ti + 4}"][f"_LUConv_{j}"]
            ns = stats[f"_NConvs_{ti + 4}"][f"_LUConv_{j}"]
            set_conv(nc, "TorchConv_0", lu.conv1)
            set_norm(nc, ns, "BatchNorm_0", lu.bn1)
            set_prelu(nc, "_Act_0", lu.relu1)
        set_prelu(params, f"_Act_{act_i}", m.relu2)
        act_i += 1

    set_conv(params, "TorchConv_5", tm.out_tr.conv1)
    set_norm(params, stats, f"BatchNorm_{bn_i}", tm.out_tr.bn1)
    set_prelu(params, f"_Act_{act_i}", tm.out_tr.relu1)
    set_conv(params, "TorchConv_6", tm.out_tr.conv2)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# res_unet — reference models/three_d/residual_unet3d.py:6-205 (InstanceNorm
# + LeakyReLU context/localization net with SHARED norm_lrelu_conv blocks)
# ---------------------------------------------------------------------------


def test_res_unet_oracle():
    mod = ref_module("three_d.residual_unet3d")
    tm = randomize(mod.UNet(in_channels=1, n_classes=2, base_n_filter=4))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.residual_unet3d import (
        ResidualUNet3D,
    )

    model = ResidualUNet3D(in_channels=1, n_classes=2, base_n_filter=4)
    # 32^3 keeps level-5 at 2^3 (InstanceNorm degenerate at 1^3)
    x = np.random.default_rng(9).normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params = variables["params"]

    set_conv(params, "TorchConv_0", tm.conv3d_c1_1)
    set_conv(params, "TorchConv_1", tm.conv3d_c1_2)
    set_conv(params, "TorchConv_2", tm.lrelu_conv_c1[1])
    for i, conv in enumerate([tm.conv3d_c2, tm.conv3d_c3, tm.conv3d_c4, tm.conv3d_c5]):
        set_conv(params, f"TorchConv_{3 + i}", conv)
    for i, nlc in enumerate([tm.norm_lrelu_conv_c2, tm.norm_lrelu_conv_c3,
                             tm.norm_lrelu_conv_c4, tm.norm_lrelu_conv_c5]):
        set_conv(params[f"_NormLReluConv_{i}"], "TorchConv_0", nlc[2])
    for i, nluc in enumerate([tm.norm_lrelu_upscale_conv_norm_lrelu_l0,
                              tm.norm_lrelu_upscale_conv_norm_lrelu_l1,
                              tm.norm_lrelu_upscale_conv_norm_lrelu_l2,
                              tm.norm_lrelu_upscale_conv_norm_lrelu_l3]):
        set_conv(params[f"_NormLReluUpscaleConvNormLRelu_{i}"], "TorchConv_0", nluc[3])
    set_conv(params, "TorchConv_7", tm.conv3d_l0)
    for i, cnl in enumerate([tm.conv_norm_lrelu_l1, tm.conv_norm_lrelu_l2,
                             tm.conv_norm_lrelu_l3, tm.conv_norm_lrelu_l4]):
        set_conv(params[f"_ConvNormLRelu_{i}"], "TorchConv_0", cnl[0])
    for i, conv in enumerate([tm.conv3d_l1, tm.conv3d_l2, tm.conv3d_l3, tm.conv3d_l4]):
        set_conv(params, f"TorchConv_{8 + i}", conv)
    set_conv(params, "TorchConv_12", tm.ds2_1x1_conv3d)
    set_conv(params, "TorchConv_13", tm.ds3_1x1_conv3d)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# unetr — reference models/three_d/unetr.py:194-294 (WHOLE model: ViT-12
# encoder, extract 3/6/9/12, conv/deconv decoder pyramid)
# ---------------------------------------------------------------------------


def test_unetr_oracle():
    mod = ref_module("three_d.unetr")
    tm = randomize(mod.UNETR(img_shape=(32, 32, 32), input_dim=1, output_dim=2,
                             embed_dim=64, patch_size=16, num_heads=4))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unetr import (
        UNETR,
    )

    model = UNETR(img_shape=(32, 32, 32), input_dim=1, output_dim=2,
                  embed_dim=64, patch_size=16, num_heads=4)
    x = np.random.default_rng(10).normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    def set_dense(scope, name, tlin):
        for k, v in f_linear(tlin).items():
            scope[name][k] = jnp.asarray(v)

    def set_ln(scope, name, tln):
        scope[name]["scale"] = jnp.asarray(tln.weight.detach().numpy())
        scope[name]["bias"] = jnp.asarray(tln.bias.detach().numpy())

    emb = tm.transformer.embeddings
    set_conv(params, "TorchConv_0", emb.patch_embeddings)
    params["position_embeddings"] = jnp.asarray(
        emb.position_embeddings.detach().numpy()
    )
    for i, tb in enumerate(tm.transformer.layer):
        scope = params[f"_TransformerBlock_{i}"]
        set_ln(scope, "LayerNorm_0", tb.attention_norm)
        att = scope["_SelfAttention_0"]
        set_dense(att, "Dense_0", tb.attn.query)
        set_dense(att, "Dense_1", tb.attn.key)
        set_dense(att, "Dense_2", tb.attn.value)
        set_dense(att, "Dense_3", tb.attn.out)
        set_ln(scope, "LayerNorm_1", tb.mlp_norm)
        set_dense(scope, "Dense_0", tb.mlp.w_1)
        set_dense(scope, "Dense_1", tb.mlp.w_2)

    def put_conv_bn_relu(idx, tcb):
        scope, sscope = params[f"_ConvBNReLU_{idx}"], stats[f"_ConvBNReLU_{idx}"]
        set_conv(scope, "TorchConv_0", tcb.block[0].block)
        set_norm(scope, sscope, "BatchNorm_0", tcb.block[1])

    def put_deconv_block(idx, tdb):
        scope, sscope = params[f"_DeconvBlock_{idx}"], stats[f"_DeconvBlock_{idx}"]
        set_convT(scope, "TorchConvTranspose_0", tdb.block[0].block)
        inner, sinner = scope["_ConvBNReLU_0"], sscope["_ConvBNReLU_0"]
        set_conv(inner, "TorchConv_0", tdb.block[1].block)
        set_norm(inner, sinner, "BatchNorm_0", tdb.block[2])

    set_convT(params, "TorchConvTranspose_0", tm.decoder12_upsampler.block)
    put_deconv_block(0, tm.decoder9)
    for j in range(3):
        put_conv_bn_relu(j, tm.decoder9_upsampler[j])
    set_convT(params, "TorchConvTranspose_1", tm.decoder9_upsampler[3].block)
    put_deconv_block(1, tm.decoder6[0])
    put_deconv_block(2, tm.decoder6[1])
    for j in range(2):
        put_conv_bn_relu(3 + j, tm.decoder6_upsampler[j])
    set_convT(params, "TorchConvTranspose_2", tm.decoder6_upsampler[2].block)
    put_deconv_block(3, tm.decoder3[0])
    put_deconv_block(4, tm.decoder3[1])
    put_deconv_block(5, tm.decoder3[2])
    for j in range(2):
        put_conv_bn_relu(5 + j, tm.decoder3_upsampler[j])
    set_convT(params, "TorchConvTranspose_3", tm.decoder3_upsampler[2].block)
    put_conv_bn_relu(7, tm.decoder0[0])
    put_conv_bn_relu(8, tm.decoder0[1])
    put_conv_bn_relu(9, tm.decoder0_header[0])
    put_conv_bn_relu(10, tm.decoder0_header[1])
    set_conv(params, "TorchConv_1", tm.decoder0_header[2].block)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    # randomized weights amplify through 12 residual blocks: outputs span
    # +-6000, so 0.02 absolute is ~3e-6 relative — float noise, not drift
    yt = run_torch(tm, x)
    scale = float(np.abs(yt.numpy()).max())
    assert scale > 100  # the transplant really is exercising the full depth
    assert_close(y, yt, atol=2e-2, rtol=2e-3)


# ---------------------------------------------------------------------------
# fcn3d — reference models/three_d/fcn3d.py:8-171 (3-D FCN-8s: pad-60 stem,
# ceil-mode pools, score/upscore fusion with crop offsets)
# ---------------------------------------------------------------------------


def test_fcn3d_oracle():
    mod = ref_module("three_d.fcn3d")
    tm = randomize(mod.FCN_Net(in_channels=1, n_class=2), scale=0.04)

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.fcn3d import (
        FCN3D,
    )

    model = FCN3D(in_channels=1, n_class=2)
    x = np.random.default_rng(11).normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params = variables["params"]

    convs = [tm.conv1_1, tm.conv1_2, tm.conv2_1, tm.conv2_2,
             tm.conv3_1, tm.conv3_2, tm.conv3_3,
             tm.conv4_1, tm.conv4_2, tm.conv4_3,
             tm.conv5_1, tm.conv5_2, tm.conv5_3,
             tm.fc6, tm.fc7, tm.score_fr, tm.score_pool4, tm.score_pool3]
    for i, c in enumerate(convs):
        set_conv(params, f"TorchConv_{i}", c)
    # upscores: the phased route consumes the flax-convention (FLIPPED
    # vs torch) kernel, stored directly as "kernel"
    for i, t in enumerate([tm.upscore2, tm.upscore_pool4, tm.upscore8]):
        dst = params[f"_BilinearDeconv_{i}"]
        for k, v in f_convT(t).items():
            dst[k] = jnp.asarray(v)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# 2-D zoo oracles — reference models/two_d/*.py (not reachable from the
# reference's drivers; library-level parity)
# ---------------------------------------------------------------------------


def test_unet2d_oracle():
    mod = ref_module("two_d.unet")
    tm = randomize(mod.Unet(in_channels=1, classes=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.two_d.unet2d import (
        UNet2D,
    )

    model = UNet2D(in_channels=1, classes=2)
    x = np.random.default_rng(12).normal(size=(1, 1, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    # DoubleConv Sequential: [conv, bn, relu, conv, bn, relu]
    dcs = [tm.inc.conv, tm.down1.mpconv[1], tm.down2.mpconv[1],
           tm.down3.mpconv[1], tm.down4.mpconv[1],
           tm.up1.conv, tm.up2.conv, tm.up3.conv, tm.up4.conv]
    i = 0
    for dc in dcs:
        for conv_m, bn_m in ((dc.conv[0], dc.conv[1]), (dc.conv[3], dc.conv[4])):
            cb, sb = params[f"ConvBlock_{i}"], stats[f"ConvBlock_{i}"]
            set_conv(cb, "TorchConv_0", conv_m)
            set_norm(cb, sb, "BatchNorm_0", bn_m)
            i += 1
    set_conv(params, "TorchConv_0", tm.outc.conv)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


def test_segnet_oracle():
    mod = ref_module("two_d.segnet")
    tm = randomize(mod.SegNet(input_nbr=1, label_nbr=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.two_d.segnet import (
        SegNet,
    )

    model = SegNet(input_nbr=1, label_nbr=2)
    x = np.random.default_rng(13).normal(size=(1, 1, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    pairs = [
        ("11", "11"), ("12", "12"), ("21", "21"), ("22", "22"),
        ("31", "31"), ("32", "32"), ("33", "33"),
        ("41", "41"), ("42", "42"), ("43", "43"),
        ("51", "51"), ("52", "52"), ("53", "53"),
        ("53d", "53d"), ("52d", "52d"), ("51d", "51d"),
        ("43d", "43d"), ("42d", "42d"), ("41d", "41d"),
        ("33d", "33d"), ("32d", "32d"), ("31d", "31d"),
        ("22d", "22d"), ("21d", "21d"), ("12d", "12d"),
    ]
    for i, (cn, bn) in enumerate(pairs):
        cb, sb = params[f"ConvBlock_{i}"], stats[f"ConvBlock_{i}"]
        set_conv(cb, "TorchConv_0", getattr(tm, f"conv{cn}"))
        set_norm(cb, sb, "BatchNorm_0", getattr(tm, f"bn{bn}"))
    set_conv(params, "TorchConv_0", tm.conv11d)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


def test_deeplab_oracle():
    mod = ref_module("two_d.deeplab")
    tm = randomize(mod.DeepLabV3(in_class=1, class_num=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.two_d.deeplab import (
        DeepLabV3,
    )

    model = DeepLabV3(in_class=1, class_num=2)
    x = np.random.default_rng(14).normal(size=(1, 1, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    rb, rs = params["ResNetBackbone_0"], stats["ResNetBackbone_0"]
    tr = tm.Resnet101
    for i, (c, b) in enumerate([(tr.conv1, tr.bn1), (tr.conv2, tr.bn2), (tr.conv3, tr.bn3)]):
        set_conv(rb, f"TorchConv_{i}", c)
        set_norm(rb, rs, f"BatchNorm_{i}", b)
    bi = 0
    for layer in [tr.layer1, tr.layer2, tr.layer3, tr.layer4]:
        for tb in layer:
            scope, sscope = rb[f"_Bottleneck_{bi}"], rs[f"_Bottleneck_{bi}"]
            set_conv(scope, "TorchConv_0", tb.conv1)
            set_norm(scope, sscope, "BatchNorm_0", tb.bn1)
            set_conv(scope, "TorchConv_1", tb.conv2)
            set_norm(scope, sscope, "BatchNorm_1", tb.bn2)
            set_conv(scope, "TorchConv_2", tb.conv3)
            set_norm(scope, sscope, "BatchNorm_2", tb.bn3)
            if tb.downsample is not None:
                set_conv(scope, "TorchConv_3", tb.downsample[0])
                set_norm(scope, sscope, "BatchNorm_3", tb.downsample[1])
            bi += 1

    ap, asb = params["ASPP_0"], stats["ASPP_0"]
    for i, c in enumerate(tm.ASPP.map_convs):
        set_conv(ap, f"TorchConv_{i}", c)
    set_norm(ap, asb, "BatchNorm_0", tm.ASPP.map_bn)
    set_conv(ap, "TorchConv_4", tm.ASPP.red_conv)
    set_conv(ap, "TorchConv_5", tm.ASPP.global_pooling_conv)
    set_norm(ap, asb, "BatchNorm_1", tm.ASPP.global_pooling_bn)
    set_conv(ap, "TorchConv_6", tm.ASPP.pool_red_conv)
    set_norm(ap, asb, "BatchNorm_2", tm.ASPP.red_bn)
    set_conv(params, "TorchConv_0", tm.classify)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=1e-3, rtol=2e-3)


def test_pspnet_oracle():
    mod = ref_module("two_d.pspnet")
    tm = randomize(mod.PSPNet(in_class=1, n_classes=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.two_d.pspnet import (
        PSPNet,
    )

    model = PSPNet(in_class=1, n_classes=2)
    x = np.random.default_rng(15).normal(size=(1, 1, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    rb, rs = params["_ResNet34Dilated_0"], stats["_ResNet34Dilated_0"]
    set_conv(rb, "TorchConv_0", tm.feats.conv1)
    set_norm(rb, rs, "BatchNorm_0", tm.feats.bn1)
    bi = 0
    for layer in [tm.feats.layer1, tm.feats.layer2, tm.feats.layer3, tm.feats.layer4]:
        for tb in layer:
            scope, sscope = rb[f"_BasicBlock_{bi}"], rs[f"_BasicBlock_{bi}"]
            set_conv(scope, "TorchConv_0", tb.conv1)
            set_norm(scope, sscope, "BatchNorm_0", tb.bn1)
            set_conv(scope, "TorchConv_1", tb.conv2)
            set_norm(scope, sscope, "BatchNorm_1", tb.bn2)
            if tb.downsample is not None:
                set_conv(scope, "TorchConv_2", tb.downsample[0])
                set_norm(scope, sscope, "BatchNorm_2", tb.downsample[1])
            bi += 1

    for i, stage in enumerate(tm.psp.stages):
        set_conv(params, f"TorchConv_{i}", stage[1])
    set_conv(params, "TorchConv_4", tm.psp.bottleneck)
    for i, up in enumerate([tm.up_1, tm.up_2, tm.up_3]):
        set_conv(params, f"TorchConv_{5 + i}", up.conv[0])
        set_norm(params, stats, f"BatchNorm_{i}", up.conv[1])
        params[f"PReLU_{i}"]["alpha"] = jnp.asarray(
            np.atleast_1d(f_prelu(up.conv[2]))
        )
    set_conv(params, "TorchConv_8", tm.final[0])

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


def test_miniseg_oracle():
    mod = ref_module("two_d.miniseg")
    tm = randomize(mod.MiniSeg(in_input=1, classes=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.two_d.miniseg import (
        MiniSeg,
    )

    model = MiniSeg(in_input=1, classes=2)
    x = np.random.default_rng(16).normal(size=(1, 1, 64, 64)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    def put_prelu(scope, name, tact):
        scope[name]["alpha"] = jnp.asarray(np.atleast_1d(f_prelu(tact)))

    def put_downsampler(idx, tdb):
        s, ss = params[f"_DownsamplerBlock_{idx}"], stats[f"_DownsamplerBlock_{idx}"]
        set_conv(s, "TorchConv_0", tdb.conv0)
        set_conv(s, "TorchConv_1", tdb.conv1)
        set_norm(s, ss, "BatchNorm_0", tdb.bn)
        put_prelu(s, "PReLU_0", tdb.act)

    def put_convblock(idx, tcb):
        s, ss = params[f"_ConvBlock_{idx}"], stats[f"_ConvBlock_{idx}"]
        set_conv(s, "TorchConv_0", tcb.conv)
        set_norm(s, ss, "BatchNorm_0", tcb.bn)
        put_prelu(s, "PReLU_0", tcb.act)

    def put_dp(idx, tdp):
        s, ss = params[f"_DilatedParallelConvBlock_{idx}"], stats[f"_DilatedParallelConvBlock_{idx}"]
        set_conv(s, "TorchConv_0", tdp.conv1x1_down)
        for j, c in enumerate([tdp.conv1, tdp.conv2, tdp.conv3, tdp.conv4]):
            set_conv(s, f"TorchConv_{j + 1}", c)
        set_conv(s, "TorchConv_5", tdp.attention)
        set_conv(s, "TorchConv_6", tdp.conv1x1_fuse)
        set_norm(s, ss, "BatchNorm_0", tdp.bn)
        put_prelu(s, "PReLU_0", tdp.act)

    def put_dpd2(idx, td):
        s, ss = params[f"_DilatedParallelConvBlockD2_{idx}"], stats[f"_DilatedParallelConvBlockD2_{idx}"]
        set_conv(s, "TorchConv_0", td.conv0)
        set_conv(s, "TorchConv_1", td.conv1)
        set_conv(s, "TorchConv_2", td.conv2)
        set_norm(s, ss, "BatchNorm_0", td.bn)

    # level 1: ConvBlock down path
    put_downsampler(0, tm.long1)
    put_convblock(0, tm.down1)
    put_convblock(1, tm.level1[0])
    put_downsampler(1, tm.level1_long[0])
    put_convblock(2, tm.level1[1])
    set_conv(params, "TorchConv_0", tm.cat1[0])
    set_norm(params, stats, "BatchNorm_0", tm.cat1[1])

    # level 2
    put_downsampler(2, tm.long2)
    put_dp(0, tm.down2)
    put_dp(1, tm.level2[0])
    put_downsampler(3, tm.level2_long[0])
    put_dp(2, tm.level2[1])
    put_dp(3, tm.level2[2])
    set_conv(params, "TorchConv_1", tm.cat2[0])
    set_norm(params, stats, "BatchNorm_1", tm.cat2[1])

    # level 3: P3=8, D3=4
    put_downsampler(4, tm.long3)
    put_dp(4, tm.down3)
    dp_i, ds_i = 5, 5
    for i in range(8):
        put_dp(dp_i, tm.level3[i])
        dp_i += 1
        if i < 4:
            put_downsampler(ds_i, tm.level3_long[i])
            ds_i += 1
    set_conv(params, "TorchConv_2", tm.cat3[0])
    set_norm(params, stats, "BatchNorm_2", tm.cat3[1])

    # level 4: P4=6, D4=3 (cat4 has no reference counterpart; its output is
    # discarded, so its random params are inert)
    put_downsampler(9, tm.long4)
    put_dp(13, tm.down4)
    dp_i, ds_i = 14, 10
    for i in range(6):
        put_dp(dp_i, tm.level4[i])
        dp_i += 1
        if i < 3:
            put_downsampler(ds_i, tm.level4_long[i])
            ds_i += 1

    # up path
    set_conv(params, "TorchConv_4", tm.up4_conv4)
    set_norm(params, stats, "BatchNorm_4", tm.up4_bn4)
    put_prelu(params, "PReLU_0", tm.up4_act)
    put_dpd2(0, tm.up3_conv4)
    set_conv(params, "TorchConv_5", tm.up3_conv3)
    set_norm(params, stats, "BatchNorm_5", tm.up3_bn3)
    put_prelu(params, "PReLU_1", tm.up3_act)
    put_dpd2(1, tm.up2_conv3)
    set_conv(params, "TorchConv_6", tm.up2_conv2)
    set_norm(params, stats, "BatchNorm_6", tm.up2_bn2)
    put_prelu(params, "PReLU_2", tm.up2_act)
    put_dpd2(2, tm.up1_conv2)
    set_conv(params, "TorchConv_7", tm.up1_conv1)
    set_norm(params, stats, "BatchNorm_7", tm.up1_bn1)
    put_prelu(params, "PReLU_3", tm.up1_act)
    set_conv(params, "TorchConv_8", tm.pred1[1])

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# torchvision/thop/fcn-blocked reference files: the imports are either
# unused (Double_Unet/FusionNet/fcn's FCN32s bodies are self-contained) or
# trivial, so minimal import stubs unlock three more DIRECT oracles.
# ---------------------------------------------------------------------------


def _install_import_stubs():
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models_m = types.ModuleType("torchvision.models")
        vgg_m = types.ModuleType("torchvision.models.vgg")

        class VGG(torch.nn.Module):  # referenced by two_d/fcn.py import only
            pass

        vgg_m.VGG = VGG
        models_m.vgg = vgg_m
        tv.models = models_m
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models_m
        sys.modules["torchvision.models.vgg"] = vgg_m
    if "thop" not in sys.modules:  # Double_Unet: `from thop import profile`
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = thop
    if "fcn" not in sys.modules:  # two_d/fcn.py: `import fcn` (unused)
        sys.modules["fcn"] = types.ModuleType("fcn")
    if "mmcv" not in sys.modules:  # vt_unet: load_checkpoint only runs when
        # a pretrained path is set (reference vt_unet.py:1090) — never here
        mmcv = types.ModuleType("mmcv")
        runner = types.ModuleType("mmcv.runner")
        runner.load_checkpoint = lambda *a, **k: None
        mmcv.runner = runner
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.runner"] = runner
    if "timm" not in sys.modules:  # vt_unet: DropPath (identity in eval —
        # our parity forward is eval) + trunc_normal_ (init only; the
        # transplant overwrites every weight anyway)
        timm = types.ModuleType("timm")
        tmodels = types.ModuleType("timm.models")
        tlayers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if self.drop_prob in (None, 0.0) or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(
                    torch.full(shape, keep, device=x.device, dtype=x.dtype)
                )
                return x / keep * mask

        tlayers.DropPath = DropPath
        tlayers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = tmodels
        tmodels.layers = tlayers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tmodels
        sys.modules["timm.models.layers"] = tlayers


def _put_unet_block(params, stats, cb_name, tblock, nm):
    """One reference `_block` (conv-BN-ReLU x2) into two flax ConvBlocks."""
    for j, cb in zip((1, 2), cb_name):
        set_conv(params[cb], "TorchConv_0", getattr(tblock, f"{nm}conv{j}"))
        set_norm(params[cb], stats[cb], "BatchNorm_0", getattr(tblock, f"{nm}norm{j}"))


def test_double_unet_oracle():
    _install_import_stubs()
    mod = ref_module("three_d.Double_Unet")
    tm = randomize(mod.Double_Unet(in_channels=1, out_channels=2,
                                   unet_init_features=32))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.double_unet import (
        DoubleUNet,
    )

    model = DoubleUNet(in_channels=1, out_channels=2, unet_init_features=32)
    x = np.random.default_rng(20).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )

    for scope_name, pfx in (("_UNet3Level_0", "cu"), ("_UNet3Level_1", "fu")):
        p = variables["params"][scope_name]
        s = variables["batch_stats"][scope_name]
        blocks = [("enc1", 0), ("enc2", 2), ("enc3", 4), ("bottleneck", 6),
                  ("dec3", 8), ("dec2", 10), ("dec1", 12)]
        for nm, i in blocks:
            tb = getattr(tm, f"{pfx}_{'encoder' + nm[-1] if nm.startswith('enc') else ('bottleneck' if nm == 'bottleneck' else 'decoder' + nm[-1])}")
            _put_unet_block(p, s, (f"ConvBlock_{i}", f"ConvBlock_{i+1}"), tb,
                            f"{pfx}_{nm}")
        for k, idx in enumerate((3, 2, 1)):
            set_convT(p, f"TorchConvTranspose_{k}", getattr(tm, f"{pfx}_upconv{idx}"))
        set_conv(p, "TorchConv_0", getattr(tm, f"{pfx}_conv"))
        if pfx == "fu":
            for k, se in enumerate([tm.SE3, tm.SE2, tm.SE1]):
                sp = p[f"SEResidual_{k}"]
                for j, lin in ((0, se.fc[0]), (1, se.fc[2])):
                    for kk, v in f_linear(lin).items():
                        sp[f"Dense_{j}"][kk] = jnp.asarray(v)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


def _put_ref_unet3d(params, stats, tm):
    """Reference-UNet3D-shaped module (encoder1..4/bottleneck/upconv4..1/
    decoder4..1/conv attrs) -> flax UNet3D scope."""
    blocks = [tm.encoder1, tm.encoder2, tm.encoder3, tm.encoder4, tm.bottleneck,
              tm.decoder4, tm.decoder3, tm.decoder2, tm.decoder1]
    names = ["enc1", "enc2", "enc3", "enc4", "bottleneck",
             "dec4", "dec3", "dec2", "dec1"]
    i = 0
    for blk, nm in zip(blocks, names):
        for j in (1, 2):
            set_conv(params[f"ConvBlock_{i}"], "TorchConv_0", getattr(blk, f"{nm}conv{j}"))
            set_norm(params[f"ConvBlock_{i}"], stats[f"ConvBlock_{i}"],
                     "BatchNorm_0", getattr(blk, f"{nm}norm{j}"))
            i += 1
    for k, up in enumerate([tm.upconv4, tm.upconv3, tm.upconv2, tm.upconv1]):
        set_convT(params, f"TorchConvTranspose_{k}", up)
    set_conv(params, "Conv_0", tm.conv)


def _put_ref_vnet(params, stats, tm, elu):
    """Reference-VNet-shaped module (in_tr/down_tr*/up_tr*/out_tr attrs) ->
    flax VNet scope. With elu=True there are no PReLU params."""

    def prelu(scope_params, name, tact):
        if not elu:
            scope_params[name]["PReLU_0"]["alpha"] = jnp.asarray(
                np.atleast_1d(f_prelu(tact))
            )

    set_conv(params, "TorchConv_0", tm.in_tr.conv1)
    set_norm(params, stats, "BatchNorm_0", tm.in_tr.bn1)
    prelu(params, "_Act_0", tm.in_tr.relu1)
    act_i, bn_i = 1, 1
    downs = [(tm.down_tr32, 1), (tm.down_tr64, 2), (tm.down_tr128, 3), (tm.down_tr256, 2)]
    for ti, (m, n_convs) in enumerate(downs):
        set_conv(params, f"TorchConv_{ti + 1}", m.down_conv)
        set_norm(params, stats, f"BatchNorm_{bn_i}", m.bn1)
        bn_i += 1
        prelu(params, f"_Act_{act_i}", m.relu1)
        act_i += 1
        for j in range(n_convs):
            lu = m.ops[j]
            nc = params[f"_NConvs_{ti}"][f"_LUConv_{j}"]
            ns = stats[f"_NConvs_{ti}"][f"_LUConv_{j}"]
            set_conv(nc, "TorchConv_0", lu.conv1)
            set_norm(nc, ns, "BatchNorm_0", lu.bn1)
            prelu(nc, "_Act_0", lu.relu1)
        prelu(params, f"_Act_{act_i}", m.relu2)
        act_i += 1
    ups = [(tm.up_tr256, 2), (tm.up_tr128, 2), (tm.up_tr64, 1), (tm.up_tr32, 1)]
    for ti, (m, n_convs) in enumerate(ups):
        set_convT(params, f"TorchConvTranspose_{ti}", m.up_conv)
        set_norm(params, stats, f"BatchNorm_{bn_i}", m.bn1)
        bn_i += 1
        prelu(params, f"_Act_{act_i}", m.relu1)
        act_i += 1
        for j in range(n_convs):
            lu = m.ops[j]
            nc = params[f"_NConvs_{ti + 4}"][f"_LUConv_{j}"]
            ns = stats[f"_NConvs_{ti + 4}"][f"_LUConv_{j}"]
            set_conv(nc, "TorchConv_0", lu.conv1)
            set_norm(nc, ns, "BatchNorm_0", lu.bn1)
            prelu(nc, "_Act_0", lu.relu1)
        prelu(params, f"_Act_{act_i}", m.relu2)
        act_i += 1
    set_conv(params, "TorchConv_5", tm.out_tr.conv1)
    set_norm(params, stats, f"BatchNorm_{bn_i}", tm.out_tr.bn1)
    prelu(params, f"_Act_{act_i}", tm.out_tr.relu1)
    set_conv(params, "TorchConv_6", tm.out_tr.conv2)


def test_fusionnet_oracle():
    """FusionNet only RUNS upstream when out_channels == in_channels (its
    fusion stem is sized in_channels*2, FusionNet.py:130 vs :222), so the
    oracle uses in=out=1 — the one configuration both frameworks share."""
    _install_import_stubs()
    mod = ref_module("three_d.FusionNet")
    tm = randomize(mod.FusionNet(in_channels=1, out_channels=1,
                                 unet_init_features=4, Cnn_init_features=4))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.fusionnet import (
        FusionNet,
    )

    model = FusionNet(in_channels=1, out_channels=1, unet_init_features=4,
                      cnn_init_features=4)
    x = np.random.default_rng(21).normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params, stats = variables["params"], variables["batch_stats"]

    _put_ref_unet3d(params["UNet3D_0"], stats["UNet3D_0"], tm)
    _put_ref_vnet(params["VNet_0"], stats["VNet_0"], tm, elu=True)
    # fusion head: conv1 (_block_CNN) -> pool -> conv2 -> upsample1 -> out_conv
    for i, tb in enumerate([tm.conv1, tm.conv2]):
        cb, sb = params[f"ConvBlock_{i}"], stats[f"ConvBlock_{i}"]
        set_conv(cb, "TorchConv_0", getattr(tb, f"conv{i + 1}conv1"))
        set_norm(cb, sb, "BatchNorm_0", getattr(tb, f"conv{i + 1}norm1"))
    set_convT(params, "TorchConvTranspose_0", tm.upsample1)
    set_conv(params, "TorchConv_0", tm.out_conv)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=1e-3, rtol=2e-3)


def test_fcn2d_oracle():
    _install_import_stubs()
    mod = ref_module("two_d.fcn")
    tm = randomize(mod.FCN32s(in_class=1, n_class=2), scale=0.04)

    from general_medical_image_segmentation_cnn_framework_tpu.models.two_d.fcn2d import (
        FCN32s,
    )

    model = FCN32s(in_class=1, n_class=2)
    x = np.random.default_rng(22).normal(size=(1, 1, 32, 32)).astype(np.float32)
    variables = unfreeze(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(to_channels_last(x)), train=False,
        )
    )
    params = variables["params"]

    convs = [tm.conv1_1, tm.conv1_2, tm.conv2_1, tm.conv2_2,
             tm.conv3_1, tm.conv3_2, tm.conv3_3,
             tm.conv4_1, tm.conv4_2, tm.conv4_3,
             tm.conv5_1, tm.conv5_2, tm.conv5_3,
             tm.fc6, tm.fc7, tm.score_fr]
    for i, c in enumerate(convs):
        set_conv(params, f"TorchConv_{i}", c)
    for k, v in f_convT(tm.upscore).items():
        params["upscore_kernel" if k == "kernel" else k] = jnp.asarray(v)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=5e-4, rtol=2e-3)


def _resnet34_stub():
    """Faithful torchvision-style resnet34 (conv1 7x7/64/s2, bn1, maxpool
    3/2/1, BasicBlock layers [3,4,6,3]) so unetpp's encoder import works.
    CAVEAT: unlike the other oracles, the ENCODER definition here is this
    stub (the public torchvision architecture), but the decoder grid, mix
    blend and heads under test are the reference's own executable code."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet34(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            inplanes = 64
            layers = []
            for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)):
                downsample = None
                if stride != 1 or inplanes != planes:
                    downsample = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes, 1, stride=stride, bias=False),
                        tnn.BatchNorm2d(planes),
                    )
                blist = [BasicBlock(inplanes, planes, stride, downsample)]
                inplanes = planes
                for _ in range(1, blocks):
                    blist.append(BasicBlock(inplanes, planes))
                layers.append(tnn.Sequential(*blist))
            self.layer1, self.layer2, self.layer3, self.layer4 = layers

    return ResNet34()


def test_unetpp_oracle():
    _install_import_stubs()
    sys.modules["torchvision.models"].resnet34 = lambda pretrained=False: _resnet34_stub()
    sys.modules["torchvision"].models.resnet34 = sys.modules["torchvision.models"].resnet34
    mod = ref_module("two_d.unetpp")
    tm = randomize(mod.ResNet34UnetPlus(num_channels=1, num_class=2))

    from general_medical_image_segmentation_cnn_framework_tpu.models.two_d.unetpp import (
        UNetPlusPlus,
    )

    model = UNetPlusPlus(num_channels=1, num_class=2)
    x = np.random.default_rng(23).normal(size=(1, 1, 64, 64)).astype(np.float32)
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)), train=False)
    )
    params, stats = variables["params"], variables["batch_stats"]

    set_conv(params, "TorchConv_0", tm.firstconv)
    set_norm(params, stats, "BatchNorm_0", tm.firstbn)
    bi = 0
    for layer in [tm.encoder1, tm.encoder2, tm.encoder3, tm.encoder4]:
        for tb in layer:
            scope, sscope = params[f"_BasicBlock_{bi}"], stats[f"_BasicBlock_{bi}"]
            set_conv(scope, "TorchConv_0", tb.conv1)
            set_norm(scope, sscope, "BatchNorm_0", tb.bn1)
            set_conv(scope, "TorchConv_1", tb.conv2)
            set_norm(scope, sscope, "BatchNorm_1", tb.bn2)
            if tb.downsample is not None:
                set_conv(scope, "TorchConv_2", tb.downsample[0])
                set_norm(scope, sscope, "BatchNorm_2", tb.downsample[1])
            bi += 1

    decs = [tm.decoder0_1, tm.decoder1_1, tm.decoder0_2, tm.decoder2_1,
            tm.decoder1_2, tm.decoder0_3, tm.decoder3_1, tm.decoder2_2,
            tm.decoder1_3, tm.decoder0_4]
    for i, td in enumerate(decs):
        scope, sscope = params[f"_DecoderBlock_{i}"], stats[f"_DecoderBlock_{i}"]
        for j, (c, b) in enumerate([(td.conv1, td.norm1), (td.conv2, td.norm2),
                                    (td.conv3, td.norm3)]):
            set_conv(scope, f"TorchConv_{j}", c)
            set_norm(scope, sscope, f"BatchNorm_{j}", b)

    for i, head in enumerate([tm.logit1, tm.logit2, tm.logit3, tm.logit4]):
        set_conv(params, f"TorchConv_{i + 1}", head)
    params["mix"] = jnp.asarray(tm.mix.detach().numpy())

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=1e-3, rtol=2e-3)


def _put_swin_block(bp, tblk):
    """One reference SwinTransformerBlock3D -> flax SwinTransformerBlock3D
    scope (norm1/attn/norm2/mlp; reference vt_unet.py:279-403)."""
    for nm, tn in (("LayerNorm_0", tblk.norm1), ("LayerNorm_1", tblk.norm2)):
        for k, v in f_norm_params(tn).items():
            bp[nm][k] = jnp.asarray(v)
    ap = bp["WindowAttention3D_0"]
    for nm, tl in (("Dense_0", tblk.attn.qkv), ("Dense_1", tblk.attn.proj)):
        for k, v in f_linear(tl).items():
            ap[nm][k] = jnp.asarray(v)
    ap["relative_position_bias_table"] = jnp.asarray(
        tblk.attn.relative_position_bias_table.detach().numpy()
    )
    for nm, tl in (("Dense_0", tblk.mlp.fc1), ("Dense_1", tblk.mlp.fc2)):
        for k, v in f_linear(tl).items():
            bp["Mlp_0"][nm][k] = jnp.asarray(v)


def _put_ln(dst_scope, name, tln):
    for k, v in f_norm_params(tln).items():
        dst_scope[name][k] = jnp.asarray(v)


@pytest.mark.slow
def test_vtunet_oracle():
    """WHOLE-MODEL VT-UNet parity against the reference's own 1103-line
    SwinTransformerSys3D (reference vt_unet.py:771, vtnet.py:12-46).

    The reference hardcodes the 128^3/patch-4 geometry (PatchExpand's
    `D * 8` view, vt_unet.py:493), so the oracle runs at the real
    128x128x128 input; embed_dim=24 (heads still [3,6,12,24]) keeps the
    torch-CPU forward tractable while exercising every code path: shifted
    windows + masks, cross-attention to cached encoder V/K/Q, the alpha=0.5
    FPE blend, PatchMerging/Expand, FinalPatchExpand_X4 and the matmul head.
    """
    _install_import_stubs()
    mod = ref_module("three_d.vtnet")
    tm = randomize(mod.VTUNet(num_classes=2, input_dim=1, embed_dim=24))

    from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.vtnet import (
        VTUNet,
    )

    model = VTUNet(num_classes=2, input_dim=1, embed_dim=24,
                   img_size=(128, 128, 128))
    x = np.random.default_rng(42).normal(size=(1, 1, 128, 128, 128)).astype(
        np.float32
    )
    variables = unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.asarray(to_channels_last(x)),
                   train=False)
    )

    r = tm.swin_unet
    p = variables["params"]["SwinTransformerSys3D_0"]
    depths = (2, 2, 2, 1)

    # patch embed (conv k4s4 as matmul) + patch_norm
    set_conv(p, "Conv_0", r.patch_embed.proj)
    _put_ln(p, "LayerNorm_0", r.patch_embed.norm)

    # encoder stages + downsamples
    for i in range(4):
        lp = p[f"BasicLayer_{i}"]
        for j in range(depths[i]):
            _put_swin_block(lp[f"SwinTransformerBlock3D_{j}"], r.layers[i].blocks[j])
        if i < 3:
            mp = lp["PatchMerging_0"]
            _put_ln(mp, "LayerNorm_0", r.layers[i].downsample.norm)
            for k, v in f_linear(r.layers[i].downsample.reduction).items():
                mp["Dense_0"][k] = jnp.asarray(v)

    _put_ln(p, "LayerNorm_1", r.norm)  # post-encoder norm

    # decoder: layers_up[0] = PatchExpand; layers_up[1..3] = BasicLayer_up
    pe = p["PatchExpand_0"]
    for k, v in f_linear(r.layers_up[0].expand).items():
        pe["Dense_0"][k] = jnp.asarray(v)
    _put_ln(pe, "LayerNorm_0", r.layers_up[0].norm)

    for inx in (1, 2, 3):
        for k, v in f_linear(r.concat_back_dim[inx]).items():
            p[f"Dense_{inx - 1}"][k] = jnp.asarray(v)
        up = p[f"BasicLayerUp_{inx - 1}"]
        tl = r.layers_up[inx]
        for j in range(len(tl.blocks)):
            _put_swin_block(up[f"SwinTransformerBlock3D_{j}"], tl.blocks[j])
        if inx < 3:
            pe = up["PatchExpand_0"]
            for k, v in f_linear(tl.upsample.expand).items():
                pe["Dense_0"][k] = jnp.asarray(v)
            _put_ln(pe, "LayerNorm_0", tl.upsample.norm)

    _put_ln(p, "LayerNorm_2", r.norm_up)

    # FinalPatchExpand_X4 + 1x1x1 head
    fp = p["FinalPatchExpandX4_0"]
    for k, v in f_linear(r.up.expand).items():
        fp["Dense_0"][k] = jnp.asarray(v)
    _put_ln(fp, "LayerNorm_0", r.up.norm)
    set_conv(p, "Conv_1", r.output)

    y = model.apply(variables, jnp.asarray(to_channels_last(x)), train=False)
    assert_close(y, run_torch(tm, x), atol=1e-3, rtol=5e-3)
