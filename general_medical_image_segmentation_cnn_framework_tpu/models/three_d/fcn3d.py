"""3-D FCN-8s (VGG-style fully convolutional net).

Capability parity with the reference's ``FCN_Net``
(/root/reference/models/three_d/fcn3d.py:8-171): padding-60 first conv,
ceil-mode max pools, conv6/7 "fc" heads with dropout, score/upscore
ConvTranspose fusion with the exact crop offsets (5, 9, 31), pool3/pool4
score scaling (1e-4 / 1e-2), and bilinear-kernel deconv init
(get_upsampling_weight, :78-91). Conv weights ~ N(0, 0.1), zero bias
(:93-105). Not registered in the reference driver; reachable here as
``config.network=fcn3d``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...nn.blocks import TorchConv, max_pool


def bilinear_kernel_init(key, shape, dtype=jnp.float32):
    """3-D bilinear upsampling kernel. Flax transpose kernel layout:
    [kd, kh, kw, in, out]; weight only on matching in/out channel pairs."""
    kd, kh, kw, cin, cout = shape
    k = kd
    factor = (k + 1) // 2
    center = factor - 1 if k % 2 == 1 else factor - 0.5
    og = np.ogrid[:k, :k, :k]
    filt = (
        (1 - abs(og[0] - center) / factor)
        * (1 - abs(og[1] - center) / factor)
        * (1 - abs(og[2] - center) / factor)
    )
    w = np.zeros(shape, dtype=np.float32)
    for c in range(min(cin, cout)):
        w[:, :, :, c, c] = filt
    return jnp.asarray(w, dtype)


class _BilinearDeconv(nn.Module):
    """VALID transposed conv with bilinear init, via the PHASED route.

    The original nn.ConvTranspose (lhs_dilation) lowering was the whole
    fcn3d pathology: the r5 prefix bisection measured the net's first 14
    stages at 20.8 ms and the deconv head at ~810 ms of the 830 ms
    64^3 forward (k16 s8 lhs-dilation is the documented SkipDenseNet
    catastrophe). conv_transpose_phased computes the identical VALID
    output as a dense ceil(k/s)-tap conv + pixel shuffle. Param is the
    same flax-convention [k,k,k,in,out] kernel, stored directly as
    "kernel" (the tree changed from ConvTranspose_0/kernel when this
    route landed — fcn3d is unreleased, no checkpoints to migrate)."""

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        k = (self.kernel_size,) * 3
        kernel = self.param(
            "kernel", bilinear_kernel_init, k + (x.shape[-1], self.features),
            jnp.float32,
        )
        if os.environ.get("GMIST_NATIVE_CONV3D"):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1, 1),
                padding=[(ki - 1, ki - 1) for ki in k],
                lhs_dilation=(self.stride,) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        from ...ops.conv3d import conv_transpose_phased

        return conv_transpose_phased(
            x.astype(self.dtype), kernel.astype(self.dtype), (self.stride,) * 3
        )


def _ceil_pool(x):
    """MaxPool3d(2, stride 2, ceil_mode=True): pad odd dims with -inf."""
    pads = [(0, 0)]
    for i in range(1, 4):
        pads.append((0, x.shape[i] % 2))
    pads.append((0, 0))
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads, constant_values=-jnp.inf)
    return max_pool(x, 2)


class FCN3D(nn.Module):
    in_channels: int = 1
    n_class: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # reference forces conv init N(0, 0.1), zero bias (:93-100)
        conv = lambda f, k=3, p=1: TorchConv(
            features=f, kernel_size=k, padding=p, dtype=self.dtype,
            init_type="normal",  # closest mapped init; gain differs (0.02 vs 0.1)
        )
        relu = nn.relu
        drop = lambda z: nn.Dropout(rate=0.5, deterministic=not train)(z)

        h = relu(conv(8, 3, 60)(x))
        h = relu(conv(8)(h))
        h = _ceil_pool(h)

        h = relu(conv(16, 3, 15)(h))
        h = relu(conv(16)(h))
        h = _ceil_pool(h)

        for _ in range(3):
            h = relu(conv(32)(h))
        h = _ceil_pool(h)
        pool3 = h

        for _ in range(3):
            h = relu(conv(64)(h))
        h = _ceil_pool(h)
        pool4 = h

        for _ in range(3):
            h = relu(conv(64)(h))
        h = _ceil_pool(h)

        h = relu(conv(512, 7, 0)(h))
        h = drop(h)
        h = relu(conv(512, 1, 0)(h))
        h = drop(h)

        h = conv(self.n_class, 1, 0)(h)
        upscore2 = _BilinearDeconv(self.n_class, 4, 2, self.dtype)(h)

        h = conv(self.n_class, 1, 0)(pool4 * 0.01)
        h = h[:, 5 : 5 + upscore2.shape[1], 5 : 5 + upscore2.shape[2], 5 : 5 + upscore2.shape[3]]
        upscore_pool4 = _BilinearDeconv(self.n_class, 4, 2, self.dtype)(upscore2 + h)

        h = conv(self.n_class, 1, 0)(pool3 * 0.0001)
        h = h[
            :, 9 : 9 + upscore_pool4.shape[1],
            9 : 9 + upscore_pool4.shape[2],
            9 : 9 + upscore_pool4.shape[3],
        ]
        h = _BilinearDeconv(self.n_class, 16, 8, self.dtype)(upscore_pool4 + h)
        h = h[:, 31 : 31 + x.shape[1], 31 : 31 + x.shape[2], 31 : 31 + x.shape[3]]
        return h.astype(jnp.float32)

    @classmethod
    def from_config(cls, config):
        return cls(
            in_channels=config.in_classes,
            n_class=config.out_classes,
            dtype=jnp.bfloat16 if getattr(config, "precision", "") == "bfloat16" else jnp.float32,
        )
