"""Fast 3-D convolution for TPU: tap-grouped / depth-decomposed conv2d.

XLA's native 3-D convolution reaches only ~7.6 TFLOPS on a v5e for the
U-Net's dominant k3 layers (measured; 8k matmul peak on the same chip:
117 TFLOPS). Two exact reformulations fix that:

1. **Depth-decomposed** (``conv3d_decomposed``): a k3x3x3 conv as THREE
   shifted 2-D convolutions over (H, W) with (N*D) as the batch axis:

       y[:, d] = sum_{dz} conv2d(x_padded[:, d*sd + dz], w[dz])

2. **Tap-grouped** (``conv3d_tapgrouped``, stride-1 depth): fold the
   depth taps into the conv2d's *output channels* — ONE conv2d with
   ``Wcat = concat_dz(w[dz])`` of shape [kh, kw, Cin, kd*Cout], then kd
   depth-shifted adds. The MXU's output-lane dimension sees kd*Cout
   instead of Cout, which lifts lane occupancy at the U-Net's shallow
   levels (Cout 32/64 -> 96..320 lanes) where 75% of the model FLOPs
   live. Measured on a v5e at 128^3: fwd+bwd 11.8 -> 8.0 ms for the
   32-ch block conv and 15.4 -> 10.9 ms for the 64->32 decoder conv
   (1.3-1.5x); never slower than the decomposed form at any level.

Both are exact (same math, same params), autodiff through
slice/pad/conv2d transposes, and fall back to the native lax conv for
dilated/grouped/non-k3/k5 cases.

Used by nn.blocks.TorchConv for every eligible conv in the model zoo.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def eligible(kernel_size, stride, dilation, groups: int) -> bool:
    k = tuple(kernel_size)
    d = tuple(dilation)
    s = tuple(stride)
    if not (
        len(k) == 3
        and k[0] == k[1] == k[2]
        and k[0] in (3, 5)  # the zoo's k3 (U-Nets) and k5 (V-Net) convs
        and groups == 1
        and all(si in (1, 2) for si in s)
    ):
        return False
    if d == (1, 1, 1):
        return True
    # dilated k3 stride-1 (HighResNet's dilation-2/4 stages): the
    # tap-grouped form handles it via rhs_dilation + wider depth shifts
    return d[0] == d[1] == d[2] and s == (1, 1, 1)


def conv3d_tapgrouped(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (1, 1, 1),
    dilation: Sequence[int] = (1, 1, 1),
) -> jnp.ndarray:
    """x: [N, D, H, W, Cin]; kernel: [k, k, k, Cin, Cout] (DHWIO).

    Depth taps grouped into conv2d output channels (kd*Cout MXU lanes),
    followed by kd depth-shifted adds carried in float32. Requires
    depth stride 1; H/W strides pass through to the conv2d. Dilation is
    wider depth shifts + conv2d rhs_dilation (HighResNet's d=2/4 stages).
    """
    n, d, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[-1]
    sd, sh, sw = stride
    pd, ph, pw = padding
    dd, dh, dw = dilation
    assert sd == 1, "tap-grouped path requires depth stride 1"

    # [kh, kw, Cin, kd*Cout], dz-major column blocks
    wcat = jnp.concatenate([kernel[dz] for dz in range(k)], axis=-1)
    yall = jax.lax.conv_general_dilated(
        x.reshape(n * d, h, w, cin),
        wcat,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h_out, w_out = yall.shape[1], yall.shape[2]
    yall = yall.reshape(n, d, h_out, w_out, k * cout)
    d_out = d + 2 * pd - dd * (k - 1)
    yp = jnp.pad(yall, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    y = None
    for dz in range(k):
        part = yp[
            :, dz * dd : dz * dd + d_out, :, :, dz * cout : (dz + 1) * cout
        ].astype(jnp.float32)
        y = part if y is None else y + part
    return y.astype(x.dtype)


def conv3d_decomposed(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (1, 1, 1),
) -> jnp.ndarray:
    """x: [N, D, H, W, Cin]; kernel: [k, k, k, Cin, Cout] (DHWIO), k odd.

    torch-style symmetric int padding. Accumulates in float32.
    """
    n, d, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[-1]
    sd, sh, sw = stride
    pd, ph, pw = padding

    xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    d_pad = d + 2 * pd
    d_out = (d_pad - k) // sd + 1

    y = None
    for dz in range(k):
        stop = dz + (d_out - 1) * sd + 1
        slab = xp[:, dz:stop:sd]  # [N, d_out, H, W, Cin]
        slab = slab.reshape(n * d_out, h, w, cin)
        # conv output stays in x.dtype (MXU accumulates f32 internally);
        # the 3-way partial sum is carried in f32. preferred_element_type
        # is avoided: a f32 output cotangent would hit the bf16 primal in
        # the conv transpose rule and fail dtype checking.
        part = jax.lax.conv_general_dilated(
            slab,
            kernel[dz],
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        y = part if y is None else y + part
    h_out, w_out = y.shape[1], y.shape[2]
    return y.reshape(n, d_out, h_out, w_out, cout).astype(x.dtype)


def conv3d_im2col(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (1, 1, 1),
) -> jnp.ndarray:
    """x: [N, D, H, W, Cin]; kernel: [k, k, k, Cin, Cout] (DHWIO).

    All k^3 taps gathered into the channel dim, ONE matmul with
    K = k^3*Cin. The r3 roofline showed the deep small-grid U-Net levels
    (8^3..32^3, 128-512 ch) at 3-12%% MFU under the tap-grouped conv2d —
    latency/occupancy-bound, not traffic-bound. Here the materialized
    [V, k^3*Cin] matrix is small (<=226 MB at 32^3x128ch bf16) and the
    contraction K = 27*Cin fills the MXU's sublane depth completely.
    Routing (nn/blocks.TorchConv) applies it only where the im2col fits
    comfortably; the large shallow levels keep the tap-grouped form
    (where im2col traffic would explode — measured r1, stem note).
    """
    n, d, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[-1]
    sd, sh, sw = stride
    pd, ph, pw = padding
    xp = jnp.pad(x, ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)))
    d_out = (d + 2 * pd - k) // sd + 1
    h_out = (h + 2 * ph - k) // sh + 1
    w_out = (w + 2 * pw - k) // sw + 1
    cols = []
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                cols.append(
                    xp[
                        :,
                        dz : dz + (d_out - 1) * sd + 1 : sd,
                        dy : dy + (h_out - 1) * sh + 1 : sh,
                        dx : dx + (w_out - 1) * sw + 1 : sw,
                        :,
                    ]
                )
    # channel order ((dz*k+dy)*k+dx)*cin + ci == row-major [kd,kh,kw,Cin]
    xm = jnp.concatenate(cols, axis=-1).reshape(-1, k**3 * cin)
    km = kernel.reshape(k**3 * cin, cout)
    y = xm @ km
    return y.reshape(n, d_out, h_out, w_out, cout).astype(x.dtype)


def conv_patch_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Conv with stride == kernel_size, no padding (patch embedding) as ONE
    matmul over space-to-depth blocks.

    x: [N, D, H, W, Cin]; kernel: [kd, kh, kw, Cin, Cout] with stride ==
    (kd, kh, kw). Non-overlapping windows make the conv a plain
    [V, kd*kh*kw*Cin] @ [K, Cout] matmul (full MXU K and N tiles vs the
    narrow native conv) — the UNETR/ViT patch-embed hot path
    (/root/reference/models/three_d/unetr.py:128-145).
    """
    n, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    do, ho, wo = d // kd, h // kh, w // kw
    xb = x.reshape(n, do, kd, ho, kh, wo, kw, cin)
    xb = xb.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # n do ho wo kd kh kw cin
    xm = xb.reshape(n * do * ho * wo, kd * kh * kw * cin)
    km = kernel.reshape(kd * kh * kw * cin, cout)
    y = xm @ km
    return y.reshape(n, do, ho, wo, cout).astype(x.dtype)


def conv_transpose_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose with kernel_size == stride as ONE matmul + pixel
    shuffle (depth-to-space).

    x: [N, D, H, W, Cin]; kernel: [kd, kh, kw, Cin, Cout] with the
    transpose conv's stride equal to the kernel extent (the zoo's k2 s2
    up-convs). Each input voxel independently emits a kd*kh*kw block:

        y[n, kd*d+a, kh*h+b, kw*w+c, o] = sum_i x[n,d,h,w,i] K[a,b,c,i,o]

    which is a [V, Cin] @ [Cin, kd*kh*kw*Cout] matmul — N=8*Cout lanes on
    the MXU instead of the narrow native conv_transpose. Exact same math
    and parameters; autodiff transposes back to matmuls.
    """
    n, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    # flax/lax conv_transpose applies the kernel spatially FLIPPED; flip
    # here so the native fallback path is numerically identical
    kflip = kernel[::-1, ::-1, ::-1]
    kmat = kflip.transpose(3, 0, 1, 2, 4).reshape(cin, kd * kh * kw * cout)
    y = jnp.einsum("vi,io->vo", x.reshape(-1, cin), kmat)
    y = y.reshape(n, d, h, w, kd, kh, kw, cout)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # n d kd h kh w kw c
    return y.reshape(n, d * kd, h * kh, w * kw, cout).astype(x.dtype)


def conv_transpose_phased(x: jnp.ndarray, kernel: jnp.ndarray, stride: Sequence[int]) -> jnp.ndarray:
    """General strided ConvTranspose as ONE small dense conv + depth-to-space.

    Produces the full 'VALID' transposed-conv output — numerically equal to

        lax.conv_general_dilated(x, kernel, strides=1, lhs_dilation=stride,
                                 padding=[(k-1, k-1)] * n)

    (the route nn.blocks.TorchConvTranspose otherwise takes) but WITHOUT
    input dilation: the output is split per subpixel phase r in [0, s)^n,
    each phase being a tiny J+1 = ceil(k/s)-tap correlation of the
    UNdilated input. All phases stack into the output-channel dim of one
    conv with prod(s)*Cout channels (full MXU lanes), then a pixel
    shuffle + fixed crop reassembles them.

    Derivation (per dim, correlation orientation as stored): the dilated
    route computes y[o] = sum_i x[i] K[i*s + k - 1 - o]. Writing
    r = (k-1-o) mod s and q = (o - (k-1) + r)/s gives
    y[o] = sum_j x[q+j] K[r + j*s] — a (J+1)-tap correlation where
    J = floor((k-1)/s), with q in [-J, L_in). Phases are stored reversed
    (r' = s-1-r) so o = (q+J)*s + r' - shift with shift = (J+1)*s - k,
    making the reassembly one reshape-transpose + static slice.

    Why: XLA's lhs_dilation lowering is catastrophic for large k/s (the
    SkipDenseNet heads run k up to 18, s up to 16, at ONE output channel
    per group — /root/reference/models/three_d/densenet3d.py:101-105);
    here the same math runs as a dense 2^n-tap conv at input resolution.
    Rank-generic (2-D and 3-D). Exact; autodiff transposes to the same
    shapes.
    """
    n_sp = x.ndim - 2
    k = tuple(kernel.shape[:n_sp])
    s = tuple(stride)
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    J = tuple((ki - 1) // si for ki, si in zip(k, s))

    # phase kernel: pad K spatially to (J+1)*s, split taps t = j*s + r,
    # reverse the r axes, fold (r'..., cout) into output channels
    pads = [(0, (ji + 1) * si - ki) for ji, si, ki in zip(J, s, k)] + [(0, 0), (0, 0)]
    kp = jnp.pad(kernel, pads)
    split = []
    for ji, si in zip(J, s):
        split += [ji + 1, si]
    kp = kp.reshape(*split, cin, cout)
    # axes: [j1, r1, j2, r2, (j3, r3,) cin, cout] — reverse each r axis
    kp = kp[(slice(None), slice(None, None, -1)) * n_sp]
    j_axes = tuple(range(0, 2 * n_sp, 2))
    r_axes = tuple(range(1, 2 * n_sp, 2))
    kp = kp.transpose(j_axes + (2 * n_sp,) + r_axes + (2 * n_sp + 1,))
    kp = kp.reshape(tuple(ji + 1 for ji in J) + (cin, -1))

    spatial = "DHW"[3 - n_sp:]
    dn = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
    z = jax.lax.conv_general_dilated(
        x, kp.astype(x.dtype),
        window_strides=(1,) * n_sp,
        padding=[(ji, ji) for ji in J],
        dimension_numbers=dn,
    )  # [N, L+J ..., prod(s)*cout]

    # pixel shuffle: [N, q1.., (r'1.., cout)] -> interleave r' into space
    b = z.shape[0]
    qs = z.shape[1 : 1 + n_sp]
    z = z.reshape((b,) + qs + s + (cout,))
    perm = [0]
    for i in range(n_sp):
        perm += [1 + i, 1 + n_sp + i]
    z = z.transpose(perm + [1 + 2 * n_sp])
    z = z.reshape((b,) + tuple(q * si for q, si in zip(qs, s)) + (cout,))

    # crop shift = (J+1)*s - k from the start; VALID length (L_in-1)*s + k
    idx = [slice(None)]
    for i in range(n_sp):
        shift = (J[i] + 1) * s[i] - k[i]
        out_len = (x.shape[1 + i] - 1) * s[i] + k[i]
        idx.append(slice(shift, shift + out_len))
    idx.append(slice(None))
    return z[tuple(idx)]


def _s2d_fold(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[N, D, H, W, C] -> [N, D/f, H/f, W/f, f^3*C]; folded channel index
    is ((pd*f + ph)*f + pw)*C + c for parities p* in [0, f)."""
    n, d, h, w, c = x.shape
    return (
        x.reshape(n, d // f, f, h // f, f, w // f, f, c)
        .transpose(0, 1, 3, 5, 2, 4, 6, 7)
        .reshape(n, d // f, h // f, w // f, f * f * f * c)
    )


def _s2d_unfold(y: jnp.ndarray, f: int, cout: int) -> jnp.ndarray:
    """Inverse of ``_s2d_fold`` for a [N, Dq, Hq, Wq, f^3*cout] tensor."""
    n, dq, hq, wq, _ = y.shape
    return (
        y.reshape(n, dq, hq, wq, f, f, f, cout)
        .transpose(0, 1, 4, 2, 5, 3, 6, 7)
        .reshape(n, dq * f, hq * f, wq * f, cout)
    )


def _s2d_expand_kernel(kernel: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """Exact parity expansion of a k3 kernel to folded space:
    for output parity p_out and tap offset delta in {0,1,2}, the source
    voxel 2*q_out + p_out + delta - 1 lands at folded offset
    Delta = floor((p_out + delta - 1 - p_in)/2) with parity
    p_in = (p_out + delta - 1) mod 2 — still a k3 conv over folded space
    with [f^3*Cin, f^3*Cout] channels. Built as one static gather, so the
    expansion is differentiable and the param stays the original
    [3,3,3,Cin,Cout] (checkpoints unchanged)."""
    import numpy as np

    assert f == 2 and kernel.shape[:3] == (3, 3, 3)
    cin, cout = kernel.shape[3], kernel.shape[4]
    td, th, tw, pid, pih, piw, pod, poh, pow_ = np.meshgrid(
        *([np.arange(3)] * 3 + [np.arange(2)] * 6), indexing="ij"
    )
    dd = 2 * (td - 1) + pid - pod + 1
    dh = 2 * (th - 1) + pih - poh + 1
    dw = 2 * (tw - 1) + piw - pow_ + 1
    valid = (
        (dd >= 0) & (dd < 3) & (dh >= 0) & (dh < 3) & (dw >= 0) & (dw < 3)
    )
    kg = kernel[np.clip(dd, 0, 2), np.clip(dh, 0, 2), np.clip(dw, 0, 2)]
    kg = kg * jnp.asarray(valid, kernel.dtype)[..., None, None]
    # [t..., pin..., pout..., cin, cout] -> [t..., (pin,cin), (pout,cout)]
    return kg.transpose(0, 1, 2, 3, 4, 5, 9, 6, 7, 8, 10).reshape(
        3, 3, 3, 8 * cin, 8 * cout
    )


def conv3d_s2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (1, 1, 1),
) -> jnp.ndarray:
    """Small-channel k3 s1 conv via exact space-to-depth (fold-by-2).

    Channels-last XLA pads the lane dim to 128, so a C=8 conv at 182^3
    (fcn3d's padding-60 stem stages, reference fcn3d.py:108-168 context)
    moves 16x the logical bytes on the largest tensors of the net — the
    r4 roofline measured the whole step at 4.7% BW / 0.2% MFU. Folding
    2x2x2 space into channels (C -> 8C) costs 8x the (trivial) FLOPs and
    cuts the padded traffic ~8x; consecutive folded convs let XLA cancel
    the inverse unfold/fold transposes between them. Exact: zero padding
    commutes with the fold, and torch's k3 pad-p conv == zero-pad by
    (p-1) then SAME k3 (covers fcn3d's p=60/15 stages)."""
    assert tuple(stride) == (1, 1, 1)
    f = 2
    cout = kernel.shape[-1]
    pd, ph, pw = padding
    if (pd, ph, pw) != (1, 1, 1):
        x = jnp.pad(
            x,
            ((0, 0), (pd - 1, pd - 1), (ph - 1, ph - 1), (pw - 1, pw - 1), (0, 0)),
        )
    n, d, h, w, _ = x.shape
    evens = [(-s) % f for s in (d, h, w)]
    if any(evens):
        x = jnp.pad(
            x, ((0, 0), (0, evens[0]), (0, evens[1]), (0, evens[2]), (0, 0))
        )
    xf = _s2d_fold(x, f)
    kf = _s2d_expand_kernel(kernel.astype(x.dtype), f)
    # folded conv rides the tap-grouped form (kd*f^3*Cout MXU lanes) —
    # the framework's measured-fastest k3s1 route
    yf = conv3d_tapgrouped(xf, kf, (1, 1, 1), (1, 1, 1))
    return _s2d_unfold(yf, f, cout)[:, :d, :h, :w, :]
