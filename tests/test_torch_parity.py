"""Cross-framework forward parity: the Flax UNet3D must match a PyTorch
model of the same architecture bit-for-bit (up to float tolerance) when
loaded with the same weights.

The torch mirror below is built from the architecture spec (conv k3p1 +
BN + ReLU x2 blocks, maxpool2, transpose k2s2, skip concat, 1x1 head),
not copied from the reference. NOTE: mirrors are no longer the primary
oracle — tests/test_reference_oracle.py transplants into the reference's
ACTUAL torch classes (imported from /root/reference) for every model that
imports with plain torch; this file remains as an environment-independent
fallback that runs even without the reference snapshot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from general_medical_image_segmentation_cnn_framework_tpu.models.three_d.unet3d import (  # noqa: E402
    UNet3D,
)


class _TorchBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = tnn.Conv3d(cin, cout, 3, padding=1)
        self.b1 = tnn.BatchNorm3d(cout)
        self.c2 = tnn.Conv3d(cout, cout, 3, padding=1)
        self.b2 = tnn.BatchNorm3d(cout)

    def forward(self, x):
        x = torch.relu(self.b1(self.c1(x)))
        return torch.relu(self.b2(self.c2(x)))


class _TorchUNet3D(tnn.Module):
    def __init__(self, cin=1, cout=2, f=4):
        super().__init__()
        self.enc = tnn.ModuleList(
            [_TorchBlock(cin, f), _TorchBlock(f, 2 * f), _TorchBlock(2 * f, 4 * f),
             _TorchBlock(4 * f, 8 * f)]
        )
        self.bottleneck = _TorchBlock(8 * f, 16 * f)
        self.ups = tnn.ModuleList(
            [tnn.ConvTranspose3d(16 * f, 8 * f, 2, 2), tnn.ConvTranspose3d(8 * f, 4 * f, 2, 2),
             tnn.ConvTranspose3d(4 * f, 2 * f, 2, 2), tnn.ConvTranspose3d(2 * f, f, 2, 2)]
        )
        self.dec = tnn.ModuleList(
            [_TorchBlock(16 * f, 8 * f), _TorchBlock(8 * f, 4 * f),
             _TorchBlock(4 * f, 2 * f), _TorchBlock(2 * f, f)]
        )
        self.head = tnn.Conv3d(f, cout, 1)
        self.pool = tnn.MaxPool3d(2, 2)

    def forward(self, x):
        skips = []
        for e in self.enc:
            x = e(x)
            skips.append(x)
            x = self.pool(x)
        x = self.bottleneck(x)
        for up, d, skip in zip(self.ups, self.dec, reversed(skips)):
            x = up(x)
            x = d(torch.cat([x, skip], dim=1))
        return self.head(x)


def _copy_conv(tconv, kernel, bias=None):
    # flax conv kernel [kd,kh,kw,in,out] -> torch [out,in,kd,kh,kw]
    w = np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2))
    tconv.weight.data = torch.tensor(w)
    if bias is not None:
        tconv.bias.data = torch.tensor(np.asarray(bias))


def _copy_convT(tconv, kernel, bias=None):
    # flax ConvTranspose/matmul kernel [kd,kh,kw,in,out] applies FLIPPED;
    # torch ConvTranspose3d kernel is [in,out,kd,kh,kw], unflipped
    k = np.asarray(kernel)[::-1, ::-1, ::-1]
    w = np.transpose(k, (3, 4, 0, 1, 2))
    tconv.weight.data = torch.tensor(np.ascontiguousarray(w))
    if bias is not None:
        tconv.bias.data = torch.tensor(np.asarray(bias))


def _copy_bn(tbn, scope):
    tbn.weight.data = torch.tensor(np.asarray(scope["scale"]))
    tbn.bias.data = torch.tensor(np.asarray(scope["bias"]))


def test_unet3d_forward_matches_torch():
    f = 4
    model = UNet3D(in_channels=1, out_channels=2, init_features=f)
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = variables["params"]

    tm = _TorchUNet3D(1, 2, f)
    tm.eval()

    # flax module naming: TorchConv_{0..17} for block convs in call order,
    # BatchNorm_{0..17}, TorchConvTranspose_{0..3}, Conv_0 head.
    conv_i, bn_i = 0, 0
    blocks = list(tm.enc) + [tm.bottleneck] + list(tm.dec)
    for blk in blocks:
        for c, b in ((blk.c1, blk.b1), (blk.c2, blk.b2)):
            scope = params[f"ConvBlock_{conv_i}"]
            tc = scope["TorchConv_0"]
            _copy_conv(c, tc["kernel"], tc["bias"])
            _copy_bn(b, scope["BatchNorm_0"])
            conv_i += 1
    for i, up in enumerate(tm.ups):
        scope = params[f"TorchConvTranspose_{i}"]
        _copy_convT(up, scope["kernel"], scope["bias"])
    head = params["Conv_0"]
    _copy_conv(tm.head, head["kernel"], head["bias"])

    y_flax = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        y_torch = tm(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    y_torch = np.transpose(y_torch, (0, 2, 3, 4, 1))

    np.testing.assert_allclose(y_flax, y_torch, atol=2e-4, rtol=1e-3)
