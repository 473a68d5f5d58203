"""Conv / pooling / upsampling blocks, channels-last (NDHWC / NHWC).

TPU-first design notes:
* channels-last keeps the channel dim on the 128-lane axis so XLA tiles
  convs straight onto the MXU;
* all blocks take a ``dtype`` (bfloat16 by default from config.precision)
  for MXU compute while params stay float32;
* torch-style integer padding/stride semantics are preserved so every model
  in the zoo reproduces the reference's exact output shapes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import bias_initializer, kernel_initializer
from .norm import BatchNorm, InstanceNorm

IntOrTuple = Union[int, Sequence[int]]


def _to_tuple(v: IntOrTuple, n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    t = tuple(v)
    assert len(t) == n, f"expected length-{n} tuple, got {t}"
    return t


class TorchConv(nn.Module):
    """Conv with torch-style int padding. Spatial rank inferred from x.

    k3x3x3 stride-1/2 convolutions — the model zoo's hot op — route
    through the depth-decomposed conv2d formulation (ops/conv3d.py),
    measured >2x faster than XLA's native conv3d on TPU. Set
    GMIST_NATIVE_CONV3D=1 to force the native path.
    """

    features: int
    kernel_size: IntOrTuple = 3
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    dilation: IntOrTuple = 1
    groups: int = 1
    use_bias: bool = True
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        from ..ops.conv3d import (
            conv3d_decomposed,
            conv3d_im2col,
            conv3d_tapgrouped,
            conv_patch_matmul,
            eligible,
        )

        n = x.ndim - 2
        k = _to_tuple(self.kernel_size, n)
        s = _to_tuple(self.stride, n)
        p = _to_tuple(self.padding, n)
        d = _to_tuple(self.dilation, n)

        # patch embedding (stride == kernel, no pad, e.g. ViT k16s16):
        # non-overlapping windows -> one full-tile matmul. Params live in a
        # child scope named like the nn.Conv fallback ("Conv_0"), so the
        # variable tree is IDENTICAL across this branch, the native branch,
        # and non-divisible input shapes — checkpoints interchange freely.
        if (
            n == 3
            and k == s
            and p == (0, 0, 0)
            and d == (1, 1, 1)
            and self.groups == 1
            and all(x.shape[1 + i] % k[i] == 0 for i in range(3))
            and not os.environ.get("GMIST_NATIVE_CONV3D")
        ):
            kernel, bias = _ConvParams(
                features=self.features,
                kernel_size=k,
                use_bias=self.use_bias,
                init_type=self.init_type,
                name="Conv_0",
            )(x.shape[-1])
            y = conv_patch_matmul(x.astype(self.dtype), kernel.astype(self.dtype))
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        if (
            n == 3
            and eligible(k, s, d, self.groups)
            and not os.environ.get("GMIST_NATIVE_CONV3D")
        ):
            cin = x.shape[-1]
            kernel = self.param(
                "kernel",
                kernel_initializer(self.init_type),
                k + (cin, self.features),
                jnp.float32,
            )
            # tap-grouped (lane-packed) form for depth-stride-1 convs —
            # measured fastest at every level on v5e; the decomposed
            # form covers the strided-depth cases
            conv = conv3d_tapgrouped if s[0] == 1 else conv3d_decomposed
            # T-layout Pallas route (GMIST_TLAYOUT_CONV=1 /
            # config.tlayout_conv): K=9*Cin im2col contraction for the
            # lane/sublane-aligned SAME k3s1 convs — the r3-roofline
            # traffic-bound shallow levels (and the UNETR/VT-UNet decoder
            # pyramids, which are the same shapes). Same param tree.
            if (
                os.environ.get("GMIST_TLAYOUT_CONV")
                and k == (3, 3, 3)
                and s == (1, 1, 1)
                and p == (1, 1, 1)
                and d == (1, 1, 1)
            ):
                from ..ops import pallas_tlayout as ptl

                # misaligned Cin (the Cin=1/4 stems) rides the zero-pad
                # wrapper — GMIST_TLAYOUT_CINPAD=0 opts out for the A/B
                cinpad_ok = os.environ.get("GMIST_TLAYOUT_CINPAD", "1") != "0"
                if ptl.supported(
                    cin, self.features, x.shape[3], self.dtype,
                    d=x.shape[1], allow_cinpad=cinpad_ok,
                ) and (
                    ptl._INTERPRET or jax.default_backend() == "tpu"
                ):
                    y = ptl.from_tlayout(
                        ptl.conv3d_tlayout_cinpad(
                            ptl.to_tlayout(x.astype(self.dtype)),
                            kernel.astype(self.dtype),
                        )
                    )
                    if self.use_bias:
                        bias = self.param(
                            "bias", bias_initializer(self.init_type),
                            (self.features,), jnp.float32,
                        )
                        y = y + bias.astype(y.dtype)
                    return y
            # small-channel LARGE-volume k3s1 convs (fcn3d's padding-60
            # stages: C=8-32 at up to 182^3): lane padding makes XLA move
            # 128/C x the logical bytes — the exact space-to-depth fold
            # (ops/conv3d.conv3d_s2d) trades 8x trivial FLOPs for ~8x
            # less padded traffic. Env-gated pending the HW A/B
            # (scripts/bench_s2d_fcn3d.py).
            if (
                os.environ.get("GMIST_S2D_CONV")
                and k == (3, 3, 3)
                and s == (1, 1, 1)
                and d == (1, 1, 1)
                and max(cin, self.features) <= 32
            ):
                from ..ops.conv3d import conv3d_s2d

                out_vox = 1
                for i in range(3):
                    out_vox *= x.shape[1 + i] + 2 * p[i] - 2
                if out_vox >= 200_000:
                    y = conv3d_s2d(
                        x.astype(self.dtype), kernel.astype(self.dtype), s, p
                    )
                    if self.use_bias:
                        bias = self.param(
                            "bias", bias_initializer(self.init_type),
                            (self.features,), jnp.float32,
                        )
                        y = y + bias.astype(y.dtype)
                    return y
            # deep small-grid levels are occupancy-bound under the conv2d
            # forms (r3 roofline: 3-12% MFU at 8^3..32^3); the one-matmul
            # im2col contraction (K = k^3*Cin) fills the MXU there and its
            # [V, k^3*Cin] materialization is small. Opt-in threshold while
            # being validated: GMIST_IM2COL_VOXELS=<max input voxels>.
            lim = int(os.environ.get("GMIST_IM2COL_VOXELS", "0"))
            if lim and d == (1, 1, 1) and x.shape[1] * x.shape[2] * x.shape[3] <= lim:
                conv = conv3d_im2col
            extra = {"dilation": d} if conv is conv3d_tapgrouped else {}
            y = conv(x.astype(self.dtype), kernel.astype(self.dtype), s, p, **extra)
            if self.use_bias:
                bias = self.param(
                    "bias", bias_initializer(self.init_type),
                    (self.features,), jnp.float32,
                )
                y = y + bias.astype(y.dtype)
            return y

        # 2-D T-layout Pallas route (GMIST_TLAYOUT_CONV=1): the 2-D zoo's
        # SAME k3s1 convs sit on the same K=Cin MXU ceiling as the 3-D
        # nets; conv2d_plane_tlayout lifts K to 9*Cin with minimal
        # traffic. Params live under the same "Conv_0" child scope as the
        # nn.Conv fallback, so the variable tree is routing-independent.
        if (
            n == 2
            and os.environ.get("GMIST_TLAYOUT_CONV")
            and k == (3, 3)
            and s == (1, 1)
            and p == (1, 1)
            and d == (1, 1)
            and self.groups == 1
        ):
            from ..ops import pallas_tlayout as ptl

            cin = x.shape[-1]
            cinpad_ok = os.environ.get("GMIST_TLAYOUT_CINPAD", "1") != "0"
            if ptl.supported(
                cin, self.features, x.shape[2], self.dtype,
                d=x.shape[0], allow_cinpad=cinpad_ok,  # d = batch (N-fold)
            ) and (ptl._INTERPRET or jax.default_backend() == "tpu"):
                kernel, bias = _ConvParams(
                    features=self.features,
                    kernel_size=k,
                    use_bias=self.use_bias,
                    init_type=self.init_type,
                    name="Conv_0",
                )(cin)
                x_t = jnp.transpose(x.astype(self.dtype), (0, 1, 3, 2))
                y_t = ptl.conv2d_tlayout_cinpad(x_t, kernel.astype(self.dtype))
                y = jnp.transpose(y_t, (0, 1, 3, 2))
                if bias is not None:
                    y = y + bias.astype(y.dtype)
                return y

        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=[(pi, pi) for pi in p],
            kernel_dilation=d,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kernel_initializer(self.init_type),
            bias_init=bias_initializer(self.init_type),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose matching torch output-size semantics:
    out = (in - 1) * stride - 2 * padding + kernel (+ output_padding)."""

    features: int
    kernel_size: IntOrTuple = 2
    stride: IntOrTuple = 2
    padding: IntOrTuple = 0
    output_padding: IntOrTuple = 0
    use_bias: bool = True
    init_type: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        from ..ops.conv3d import conv_transpose_matmul

        n = x.ndim - 2
        k = _to_tuple(self.kernel_size, n)
        s = _to_tuple(self.stride, n)
        p = _to_tuple(self.padding, n)
        op = _to_tuple(self.output_padding, n)

        # k == s, no pad: each voxel emits an independent block -> one
        # full-lane matmul + pixel shuffle (ops/conv3d.py), much faster
        # than the native transposed conv on TPU.
        if (
            n == 3
            and k == s
            and p == (0, 0, 0)
            and op == (0, 0, 0)
            and not os.environ.get("GMIST_NATIVE_CONV3D")
        ):
            cin = x.shape[-1]
            kernel = self.param(
                "kernel",
                kernel_initializer(self.init_type),
                k + (cin, self.features),
                jnp.float32,
            )
            y = conv_transpose_matmul(x.astype(self.dtype), kernel.astype(self.dtype))
            if self.use_bias:
                bias = self.param(
                    "bias", bias_initializer(self.init_type),
                    (self.features,), jnp.float32,
                )
                y = y + bias.astype(y.dtype)
            return y

        # General case: transposed conv as an input-dilated correlation.
        # Torch convT(w[in,out,k..]) == correlate the s-dilated, (k-1)-padded
        # input with the spatially-FLIPPED w — which is exactly the [k..,in,
        # out] kernel convention the k==s matmul fast path above stores. One
        # param layout ("kernel"/"bias" direct) and one convention for BOTH
        # routes, so the variable tree never depends on shapes or env
        # (the r2 param-tree invariant; the previous nn.ConvTranspose
        # fallback nested params under ConvTranspose_0 with an unflipped
        # kernel). 'VALID' output: (in-1)*s + k; torch then crops `padding`
        # from both ends and appends `output_padding` at the end.
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            kernel_initializer(self.init_type),
            k + (cin, self.features),
            jnp.float32,
        )
        spatial = "DHW"[3 - n :] if n <= 3 else None
        assert spatial is not None, f"unsupported rank {n}"
        if max(s) > 1 and not os.environ.get("GMIST_NATIVE_CONV3D"):
            # phase decomposition: one ceil(k/s)-tap dense conv with
            # prod(s)*Cout output lanes + pixel shuffle — identical math,
            # no lhs_dilation (whose XLA lowering is catastrophic for
            # large k/s, e.g. the SkipDenseNet k=s+2 upsampling heads)
            from ..ops.conv3d import conv_transpose_phased

            y = conv_transpose_phased(
                x.astype(self.dtype), kernel.astype(self.dtype), s
            )
        else:
            dn = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1,) * n,
                padding=[(ki - 1, ki - 1) for ki in k],
                lhs_dilation=s,
                dimension_numbers=dn,
            )
        if self.use_bias:
            bias = self.param(
                "bias", bias_initializer(self.init_type),
                (self.features,), jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        # torch crop: out = VALID - 2p + op, keeping p..VALID-p+op — the op
        # extra rows at the end are REAL values from the VALID output (only
        # zero-padded if op > p, which torch restricts to op < stride).
        slices = [slice(None)]
        pads = [(0, 0)]
        for i in range(n):
            hi = min(y.shape[1 + i], y.shape[1 + i] - p[i] + op[i])
            slices.append(slice(p[i], hi))
            pads.append((0, max(0, op[i] - p[i])))
        slices.append(slice(None))
        pads.append((0, 0))
        y = y[tuple(slices)]
        if any(pad[1] > 0 for pad in pads):
            y = jnp.pad(y, pads)
        return y


def max_pool(x, window: IntOrTuple = 2, stride: Optional[IntOrTuple] = None, padding: IntOrTuple = 0):
    """torch MaxPoolNd semantics (floor division output size)."""
    n = x.ndim - 2
    w = _to_tuple(window, n)
    s = _to_tuple(stride if stride is not None else window, n)
    p = _to_tuple(padding, n)
    pads = tuple((pi, pi) for pi in p)
    return nn.max_pool(x, window_shape=w, strides=s, padding=pads)


def avg_pool(x, window: IntOrTuple = 2, stride: Optional[IntOrTuple] = None, padding: IntOrTuple = 0):
    n = x.ndim - 2
    w = _to_tuple(window, n)
    s = _to_tuple(stride if stride is not None else window, n)
    p = _to_tuple(padding, n)
    pads = tuple((pi, pi) for pi in p)
    return nn.avg_pool(x, window_shape=w, strides=s, padding=pads)


def max_pool_with_mask(x):
    """2x2/stride-2 max pool returning (pooled, one-hot argmax mask).

    TPU-friendly formulation of torch's ``max_pool2d(return_indices=True)``
    (used by SegNet): instead of integer indices, keep a one-hot window mask
    [B, H/2, W/2, 4, C] that ``max_unpool_with_mask`` uses to scatter
    values back — pure reshapes/selects, no gather.
    """
    b, h, w, c = x.shape
    windows = x.reshape(b, h // 2, 2, w // 2, 2, c)
    windows = windows.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4, c)
    pooled = jnp.max(windows, axis=3)
    mask = (windows == pooled[:, :, :, None, :]).astype(x.dtype)
    # break ties like torch (first max wins): keep only the first match
    first = jnp.cumsum(mask, axis=3)
    mask = mask * (first == 1).astype(x.dtype)
    return pooled, mask


def max_unpool_with_mask(x, mask):
    """Inverse of max_pool_with_mask: place x at the recorded window slots."""
    b, h, w, c = x.shape
    windows = x[:, :, :, None, :] * mask  # [B, h, w, 4, C]
    windows = windows.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return windows.reshape(b, h * 2, w * 2, c)


def global_avg_pool(x):
    """Adaptive average pool to 1 (squeeze-excite style); keeps [N, 1.., C]."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(x, axis=axes, keepdims=True)


def resize_nearest(x, scale: IntOrTuple = 2):
    """Nearest-neighbor upsample of the spatial dims (torch Upsample(nearest))."""
    n = x.ndim - 2
    s = _to_tuple(scale, n)
    shape = (x.shape[0],) + tuple(x.shape[1 + i] * s[i] for i in range(n)) + (x.shape[-1],)
    return jax.image.resize(x, shape, method="nearest")


def resize_linear(x, scale: IntOrTuple = 2, shape: Optional[Sequence[int]] = None):
    """Tri/bi-linear upsample, align_corners=False (torch default).

    jax.image.resize('linear') matches torch's align_corners=False
    half-pixel-center convention.
    """
    n = x.ndim - 2
    if shape is None:
        s = _to_tuple(scale, n)
        shape = tuple(x.shape[1 + i] * s[i] for i in range(n))
    full = (x.shape[0],) + tuple(shape) + (x.shape[-1],)
    # antialias=False: torch interpolate does NOT lowpass when downscaling
    # (PSPNet's 6x6 prior -> 4x4 map hits this; caught by the oracle tests)
    return jax.image.resize(x, full, method="linear", antialias=False)


def remat_policy(name: Optional[str]):
    """Map config.remat_policy to a jax checkpoint policy.

    ''/'full'  -> None (recompute everything inside the remat block)
    'conv'     -> save conv outputs (checkpoint_name 'conv_out' above),
                  recompute only the cheap norm/activation epilogue —
                  much less recompute than full-block remat at a small
                  memory cost
    'dots'     -> jax.checkpoint_policies.checkpoint_dots
    """
    if not name or name == "full":
        return None
    if name == "conv":
        return jax.checkpoint_policies.save_only_these_names("conv_out")
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    raise ValueError(f"unknown remat_policy {name!r}")


def resize_linear_align_corners(x, shape: Sequence[int]):
    """torch interpolate(mode='bi/trilinear', align_corners=True), exact.

    Output index j samples the input at j*(in-1)/(out-1) per axis —
    separable gather + lerp (jax.image's scale_and_translate uses the
    half-pixel-center convention and does NOT reproduce align_corners;
    caught by the direct-oracle parity tests)."""
    n = x.ndim - 2
    y = x
    for i in range(n):
        axis = 1 + i
        out_len = int(shape[i])
        in_len = y.shape[axis]
        if out_len == in_len:
            continue
        if in_len == 1:
            reps = [1] * y.ndim
            reps[axis] = out_len
            y = jnp.tile(y, reps)
            continue
        pos = jnp.arange(out_len, dtype=jnp.float32) * (
            (in_len - 1) / (out_len - 1)
        )
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_len - 1)
        frac = (pos - lo.astype(jnp.float32)).astype(y.dtype)
        bshape = [1] * y.ndim
        bshape[axis] = out_len
        frac = frac.reshape(bshape)
        y = jnp.take(y, lo, axis=axis) * (1 - frac) + jnp.take(y, hi, axis=axis) * frac
    return y


_ACTS: dict = {
    "relu": nn.relu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "elu": nn.elu,
    "gelu": nn.gelu,
    "sigmoid": nn.sigmoid,
    "tanh": jnp.tanh,
    "none": lambda x: x,
}


class PReLU(nn.Module):
    """torch.nn.PReLU(num_parameters=1, init=0.25)."""

    num_parameters: int = 1

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, 0.25, jnp.float32),
            (self.num_parameters,),
        )
        a = alpha if self.num_parameters == 1 else alpha.reshape((1,) * (x.ndim - 1) + (-1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class _ConvParams(nn.Module):
    """Owns the same params TorchConv's direct path creates (so a
    Pallas-routed ConvBlock keeps a checkpoint-identical variable tree)."""

    features: int
    kernel_size: Tuple[int, ...]
    use_bias: bool
    init_type: str

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel",
            kernel_initializer(self.init_type),
            tuple(self.kernel_size) + (cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", bias_initializer(self.init_type), (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class _BNParams(nn.Module):
    """Owns the same params/stats nn.norm.BatchNorm creates (read-only view
    for the folded inference path)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        return scale, bias, mean.value, var.value


class ConvBlock(nn.Module):
    """Conv -> Norm -> Activation (the zoo's universal building block).

    Covers the reference's `(Conv3d k3p1 -> BN -> ReLU)` U-Net block
    (/root/reference/models/three_d/unet3d.py:73-104) and variants with
    InstanceNorm/LeakyReLU etc. XLA fuses the norm+activation into the conv
    epilogue on TPU.

    ``pallas=True`` (config.pallas_conv) routes lane-aligned k3/s1/BN/ReLU
    blocks through the fused Pallas kernel (ops/pallas_conv.py): at eval the
    whole Conv+BN+ReLU is ONE kernel with BatchNorm folded into the weights;
    at train the conv runs through pallas_conv3d's custom VJP and BatchNorm
    keeps its batch-stat semantics. The variable tree is identical to the
    unfused block, so checkpoints interchange freely.
    """

    features: int
    kernel_size: IntOrTuple = 3
    stride: IntOrTuple = 1
    padding: IntOrTuple = 1
    dilation: IntOrTuple = 1
    norm: str = "batch"  # 'batch' | 'instance' | 'none'
    act: str = "relu"
    use_bias: bool = True
    init_type: str = "none"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    pallas: bool = False

    def _pallas_eligible(self, x) -> bool:
        from ..ops.pallas_conv import _INTERPRET, eligible_pallas

        n = x.ndim - 2
        return (
            self.pallas
            and n == 3
            and _to_tuple(self.kernel_size, n) == (3, 3, 3)
            and _to_tuple(self.stride, n) == (1, 1, 1)
            and _to_tuple(self.padding, n) == (1, 1, 1)
            and _to_tuple(self.dilation, n) == (1, 1, 1)
            and self.norm == "batch"
            and self.act == "relu"
            and eligible_pallas(x.shape[-1], self.features)
            and (_INTERPRET or jax.default_backend() == "tpu")
        )

    def _tlayout_block_shape_ok(self, x) -> bool:
        import os

        from ..ops import pallas_tlayout as ptl

        n = x.ndim - 2
        return (
            n == 3
            and _to_tuple(self.kernel_size, n) == (3, 3, 3)
            and _to_tuple(self.stride, n) == (1, 1, 1)
            and _to_tuple(self.padding, n) == (1, 1, 1)
            and _to_tuple(self.dilation, n) == (1, 1, 1)
            and self.norm == "batch"
            and self.act == "relu"
            and ptl.supported(
                x.shape[-1], self.features, x.shape[3], self.dtype,
                d=x.shape[1],
                allow_cinpad=os.environ.get("GMIST_TLAYOUT_CINPAD", "1") != "0",
            )
            and (ptl._INTERPRET or jax.default_backend() == "tpu")
        )

    def _tlayout_fused_eligible(self, x) -> bool:
        """Eval-only single-kernel Conv+BN+ReLU via the v2 fused-depth
        T-layout conv (GMIST_TLAYOUT_CONV=1 + GMIST_TLAYOUT_V2=1): BN is
        folded into the weights and bias+ReLU ride the kernel's flush, so
        the block costs one input read and one output write."""
        import os

        return (
            os.environ.get("GMIST_TLAYOUT_CONV")
            and os.environ.get("GMIST_TLAYOUT_V2")
            and self._tlayout_block_shape_ok(x)
        )

    def _tlayout_resident_eligible(self, x) -> bool:
        """Train-mode T-layout residency (GMIST_TLAYOUT_CONV=1): run
        conv -> BN -> ReLU entirely in [N, D, H, C, W] so the only layout
        transposes sit at the block boundary — XLA then cancels them
        between ADJACENT resident blocks (DoubleConv pairs), where the
        per-conv TorchConv route pays a full HBM round trip per conv.
        Opt out with GMIST_TLAYOUT_BLOCK=0 for the A/B."""
        import os

        return (
            os.environ.get("GMIST_TLAYOUT_CONV")
            and os.environ.get("GMIST_TLAYOUT_BLOCK", "1") != "0"
            and self._tlayout_block_shape_ok(x)
        )

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not train and self._tlayout_fused_eligible(x):
            from ..ops import pallas_tlayout as ptl
            from ..ops.pallas_conv import fold_batchnorm

            kernel, cbias = _ConvParams(
                features=self.features,
                kernel_size=(3, 3, 3),
                use_bias=self.use_bias,
                init_type=self.init_type,
                name="TorchConv_0",
            )(x.shape[-1])
            scale, bbias, mean, var = _BNParams(name="BatchNorm_0")(self.features)
            fk, fb = fold_batchnorm(kernel, cbias, scale, bbias, mean, var)
            y_t = ptl.conv3d_tlayout_fused_cinpad(
                ptl.to_tlayout(x.astype(self.dtype)),
                fk.astype(self.dtype),
                bias=fb,
                relu=True,
            )
            return ptl.from_tlayout(y_t)
        if train and self._tlayout_resident_eligible(x):
            from jax.ad_checkpoint import checkpoint_name

            from ..ops import pallas_tlayout as ptl

            kernel, cbias = _ConvParams(
                features=self.features,
                kernel_size=(3, 3, 3),
                use_bias=self.use_bias,
                init_type=self.init_type,
                name="TorchConv_0",
            )(x.shape[-1])
            y_t = ptl.conv3d_tlayout_cinpad(
                ptl.to_tlayout(x.astype(self.dtype)), kernel.astype(self.dtype)
            )
            if cbias is not None:
                y_t = y_t + cbias.astype(y_t.dtype)[None, None, None, :, None]
            y_t = checkpoint_name(y_t, "conv_out")
            y_t = BatchNorm(
                use_running_average=False,
                dtype=self.dtype,
                axis_name=self.axis_name,
                channel_axis=3,
                name="BatchNorm_0",
            )(y_t)
            return ptl.from_tlayout(nn.relu(y_t))
        if self._pallas_eligible(x):
            from ..ops.pallas_conv import (
                fold_batchnorm,
                fused_conv3d_bn_relu,
                pallas_conv3d,
            )

            kernel, cbias = _ConvParams(
                features=self.features,
                kernel_size=(3, 3, 3),
                use_bias=self.use_bias,
                init_type=self.init_type,
                name="TorchConv_0",
            )(x.shape[-1])
            if not train:
                scale, bbias, mean, var = _BNParams(name="BatchNorm_0")(self.features)
                fk, fb = fold_batchnorm(kernel, cbias, scale, bbias, mean, var)
                return fused_conv3d_bn_relu(
                    x.astype(self.dtype), fk.astype(self.dtype), fb
                )
            y = pallas_conv3d(x.astype(self.dtype), kernel.astype(self.dtype))
            if cbias is not None:
                y = y + cbias.astype(y.dtype)
            # same named checkpoint as the XLA branch below so
            # remat_policy='conv' keeps its meaning under pallas_conv=true
            from jax.ad_checkpoint import checkpoint_name

            y = checkpoint_name(y, "conv_out")
            y = BatchNorm(
                use_running_average=False,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name="BatchNorm_0",
            )(y)
            return nn.relu(y)

        y = TorchConv(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=self.use_bias,
            init_type=self.init_type,
            dtype=self.dtype,
        )(x)
        # named checkpoint for selective remat (remat_policy='conv': save
        # the conv output, recompute only the cheap norm+act in the bwd)
        from jax.ad_checkpoint import checkpoint_name

        y = checkpoint_name(y, "conv_out")
        if self.norm == "batch":
            y = BatchNorm(
                use_running_average=not train, dtype=self.dtype, axis_name=self.axis_name
            )(y)
        elif self.norm == "instance":
            y = InstanceNorm(dtype=self.dtype)(y)
        elif self.norm != "none":
            raise ValueError(f"unknown norm {self.norm}")
        if self.act == "prelu":
            y = PReLU()(y)
        else:
            y = _ACTS[self.act](y)
        return y


class Dropout(nn.Module):
    """Dropout wired to the 'dropout' rng collection; inert in eval."""

    rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.Dropout(rate=self.rate, deterministic=not train)(x)
