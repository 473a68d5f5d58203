"""Pallas T-layout conv3d: full-depth im2col contraction (K = 9*Cin).

The r3 roofline (BASELINE.md) closed every CHANNELS-LAST Pallas
formulation for Cout < 128: tap-packed lanes need lane slices at
32/64-offsets (Mosaic hang), and padding channels to 128 costs 4x FLOPs.
The open question (VERDICT r3 #3) was a layout where nothing ever slices
the lane dim at a sub-128 offset. This kernel is that layout:

* activations travel as **[N, D, H, C, W]** ("T-layout"): C lives in the
  SUBLANE dimension (8/16-granular — 32-channel offsets are aligned) and
  W lives in LANES (128-granular — only ever sliced at W-multiples);
* per grid step (n, z, h-strip) the kernel DMAs a [bh+2, Cin, W] slab
  (halos live in MAJOR dims, so any offset is tile-aligned), builds the
  2-D im2col matrix [9*Cin, bh*W] in a VMEM scratch — dx taps are lane
  ROLLS of the whole slab (pltpu.roll) with edge masks, dy taps are
  major-dim slices, writes land at (dy*3+dx)*Cin sublane offsets — and
  runs ONE MXU matmul [kd*Cout, 9*Cin] @ [9*Cin, bh*W];
* K = 9*Cin (288 at Cin=32) instead of the tap-grouped path's K = Cin=32,
  lifting the contraction off the K/128 MXU ceiling that pins XLA's
  conv2d at 43-71 TF for shallow UNet levels;
* depth taps ride in the OUTPUT rows (kd*Cout = 96 sublanes), and the
  depth shift-add runs OUTSIDE the kernel in XLA — in T-layout that is a
  sublane-dim slice, which XLA handles natively (exactly
  conv3d_tapgrouped's epilogue, reference conv semantics
  /root/reference/models/three_d/unet3d.py:10-18 Conv3d(k3,p1)).

Input is read once (plus the bh+2/bh H-halo), output written once:
minimal traffic where the r3 roofline measured XLA moving 2.9-7.6x
minimal bytes.

Backward: custom VJP. dgrad is the SAME kernel with the spatially
flipped, channel-transposed weights (s1k3 SAME conv is self-adjoint up
to flips); wgrad is one XLA conv_general_dilated with relabeled
dimension numbers (no transposes).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_INTERPRET = False  # test hook


def supported(cin: int, cout: int, w: int, dtype, d: int | None = None) -> bool:
    """Hardware-path eligibility: every sublane offset in the kernel is a
    multiple of Cin and every lane slice a multiple of W, so Cin must be
    sublane-tile aligned (32 covers f32 and bf16) and W lane-aligned.

    W in [32, 128) that divides 128 is eligible through depth-slice lane
    FOLDING: f = 128//W depth slices ride side-by-side in the lane dim
    ([..., C, f*W]); needs D % f == 0 (pass ``d`` to check — the per-depth
    2-D conv treats slices independently, so folding is exact)."""
    if cin % 32 or cout % 8:
        return False
    if w % 128 == 0:
        return True
    if w >= 32 and 128 % w == 0:
        return d is None or d % (128 // w) == 0
    return False


def _kernel(x_ref, w_ref, out_ref, slab, rhs, sem, *, bh, cin, cout, w, w_seg):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    z = pl.program_id(1)
    j = pl.program_id(2)

    dma = pltpu.make_async_copy(
        # [bh+2, Cin, W] H-strip with halo rows; H is a MAJOR dim of the
        # [N, D, Hp, C, W] source so any row offset is tile-aligned
        x_ref.at[n, z, pl.ds(j * bh, bh + 2)],
        slab,
        sem,
    )
    dma.start()
    dma.wait()

    sl = slab[...]
    # w_seg < w: the lane dim carries w//w_seg independent depth slices
    # side-by-side (lane folding); the edge mask then applies per SEGMENT
    # (lane % w_seg), which also zeroes the cross-segment roll leakage
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, cin, w), 2)
    if w_seg != w:
        lane = jax.lax.rem(lane, w_seg)
    for dx in range(3):
        # tap column w+dx-1: roll the W (lane) axis by 1-dx and zero the
        # wrapped edge column — never a sub-128 lane slice
        shift = 1 - dx
        if shift == 0:
            shifted = sl
        else:
            shifted = pltpu.roll(sl, shift=shift % w, axis=2)
            if shift > 0:
                shifted = jnp.where(lane >= shift, shifted, 0)
            else:
                shifted = jnp.where(lane < w_seg + shift, shifted, 0)
        for h in range(bh):
            for dy in range(3):
                # rhs[(dy,dx,ci), h*W + w] = x[z, j*bh+h+dy-1, ci, w+dx-1]
                # sublane offset (dy*3+dx)*Cin (32-mult), lane offset h*W
                rhs[
                    pl.ds((dy * 3 + dx) * cin, cin),
                    pl.ds(h * w, w),
                ] = shifted[h + dy]

    # ONE deep-K matmul: [kd*Cout, 9*Cin] @ [9*Cin, bh*W]
    y = jax.lax.dot_general(
        w_ref[...],
        rhs[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for h in range(bh):
        out_ref[0, 0, h] = y[:, h * w : (h + 1) * w].astype(out_ref.dtype)


def conv2d_tapcols_tlayout(
    x_t: jnp.ndarray, kernel: jnp.ndarray, bh: int = None
) -> jnp.ndarray:
    """Per-depth-slice 2-D conv with 3-D taps grouped into output rows.

    x_t: [N, D, H, C=Cin, W] (T-layout); kernel: [3, 3, 3, Cin, Cout]
    (DHWIO). Returns y_pre [N, D, H, kd*Cout, W] where
    ``y_pre[n, z, h, dz*Cout + co, w] = (conv2d(x[z]; kernel[dz]))[h, co, w]``
    — the same intermediate as ops/conv3d.conv3d_tapgrouped's conv2d, in
    T-layout. The caller applies the depth shift-add.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d, h, cin, w = x_t.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, 3), "k3 only"
    if bh is None:
        import os

        bh = int(os.environ.get("GMIST_TLAYOUT_BH", "8"))  # HW sweep knob
    if h % bh != 0:
        bh = next(b for b in range(min(bh, h), 0, -1) if h % b == 0)

    # lane folding for W < 128 (supported() gate): ride f = 128//W depth
    # slices side-by-side in lanes — [N, D, H, C, W] -> [N, D/f, H, C, f*W].
    # The per-depth 2-D conv treats slices independently and the kernel's
    # edge masks apply per w_seg segment, so this is exact.
    w_seg, fold, d_k = w, 1, d
    if w % 128 != 0:
        fold = 128 // w
        assert d % fold == 0 and 128 % w == 0, (d, w)
        x_t = (
            x_t.reshape(n, d // fold, fold, h, cin, w)
            .transpose(0, 1, 3, 4, 2, 5)
            .reshape(n, d // fold, h, cin, fold * w)
        )
        d_k = d // fold
        w = fold * w

    # pad H by 1 halo row on each side (SAME, ph=1)
    xp = jnp.pad(x_t, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))

    # [kd*Cout, 9*Cin]: rows (dz, co), cols (dy, dx, ci)
    w_flat = kernel.transpose(0, 4, 1, 2, 3).reshape(3 * cout, 9 * cin)

    kern = partial(_kernel, bh=bh, cin=cin, cout=cout, w=w, w_seg=w_seg)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d_k, h, 3 * cout, w), x_t.dtype),
        grid=(n, d_k, h // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bh, 3 * cout, w),
            lambda i, z, j: (i, z, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, cin, w), x_t.dtype),
            pltpu.VMEM((9 * cin, bh * w), x_t.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(xp, w_flat.astype(x_t.dtype))
    if fold > 1:
        y = (
            y.reshape(n, d_k, h, 3 * cout, fold, w_seg)
            .transpose(0, 1, 4, 2, 3, 5)
            .reshape(n, d, h, 3 * cout, w_seg)
        )
    return y


def _shift_add_depth(y_pre: jnp.ndarray, cout: int, out_dtype) -> jnp.ndarray:
    """out[d] = sum_dz y_pre[d+dz-1, dz-block] in f32 (pd=1), T-layout
    sublane-dim channel slices (identical epilogue to conv3d_tapgrouped)."""
    n, d, h, _, w = y_pre.shape
    yp = jnp.pad(y_pre, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        part = yp[:, dz : dz + d, :, dz * cout : (dz + 1) * cout, :].astype(
            jnp.float32
        )
        out = part if out is None else out + part
    return out.astype(out_dtype)


@jax.custom_vjp
def conv3d_tlayout(x_t: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3-D conv, k=3, stride 1, SAME, T-layout.

    x_t: [N, D, H, Cin, W]; kernel: [3,3,3,Cin,Cout] -> [N, D, H, Cout, W].
    """
    cout = kernel.shape[-1]
    y_pre = conv2d_tapcols_tlayout(x_t, kernel)
    return _shift_add_depth(y_pre, cout, x_t.dtype)


def _wgrad_tlayout(x_t: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dw[dz,dy,dx,ci,co] = sum_{n,d,h,w} x[n,d+dz-1,h+dy-1,ci,w+dx-1] *
    g[n,d,h,co,w] — ONE conv_general_dilated with relabeled dims (batch=ci,
    feature=n), no transposes."""
    dn = jax.lax.conv_dimension_numbers(
        x_t.shape, g.shape, ("CDHNW", "IDHOW", "NDHCW")
    )
    dw = jax.lax.conv_general_dilated(
        x_t,
        g,
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return dw  # [3, 3, 3? ...] -> spec "NDHCW": [ci, 3, 3, co, 3]


def _conv3d_tlayout_fwd(x_t, kernel):
    return conv3d_tlayout(x_t, kernel), (x_t, kernel)


def _conv3d_tlayout_bwd(res, g):
    x_t, kernel = res
    # dgrad: correlate g with the spatially flipped, channel-transposed
    # kernel — the same Pallas kernel again (s1k3 SAME is self-adjoint)
    k_flip = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = conv3d_tlayout(g.astype(x_t.dtype), k_flip)
    dw = _wgrad_tlayout(x_t, g)  # "NDHCW" out: [ci, kz, ky, co, kx]
    dw = dw.transpose(1, 2, 4, 0, 3).astype(kernel.dtype)  # [kz,ky,kx,ci,co]
    return dx.astype(x_t.dtype), dw


conv3d_tlayout.defvjp(_conv3d_tlayout_fwd, _conv3d_tlayout_bwd)


def to_tlayout(x: jnp.ndarray) -> jnp.ndarray:
    """[N, D, H, W, C] -> [N, D, H, C, W]."""
    return jnp.transpose(x, (0, 1, 2, 4, 3))


def from_tlayout(x_t: jnp.ndarray) -> jnp.ndarray:
    """[N, D, H, C, W] -> [N, D, H, W, C]."""
    return jnp.transpose(x_t, (0, 1, 2, 4, 3))
