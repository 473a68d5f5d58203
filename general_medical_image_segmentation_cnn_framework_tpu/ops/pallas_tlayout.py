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


def supported(
    cin: int, cout: int, w: int, dtype, d: int | None = None,
    allow_cinpad: bool = False,
) -> bool:
    """Hardware-path eligibility: every sublane offset in the kernel is a
    multiple of Cin and every lane slice a multiple of W, so Cin must be
    sublane-tile aligned (32 covers f32 and bf16) and W lane-aligned.

    W in [32, 128) that divides 128 is eligible through depth-slice lane
    FOLDING: f = 128//W depth slices ride side-by-side in the lane dim
    ([..., C, f*W]); needs D % f == 0 (pass ``d`` to check — the per-depth
    2-D conv treats slices independently, so folding is exact).

    ``allow_cinpad``: misaligned Cin (the Cin=1/4 stems above all) is
    eligible through the ``conv3d_tlayout_cinpad`` wrapper, which
    zero-pads Cin to the next multiple of 32 OUTSIDE the kernel — the
    kernel then runs only its proven aligned shapes, and zero channels
    keep outputs and every gradient exact (pad's VJP slices them away).
    In T-layout the pad costs (cin_pad/cin)x input bytes — for the
    Cin=1 stem that is 32x of a small tensor where channels-LAST XLA
    pays the full 128x lane-padding (r2 note: 5-6 ms at 128^3).

    Big-channel shapes must additionally FIT: the kernels hold the whole
    [3*Cout, 9*Cin] weight block plus the im2col scratch in VMEM, and
    two UNETR decoder convs overflowed the 16 MB scoped-vmem limit on a
    real v5e (r9 HW session): Cin=512/Cout=256 needed 18.60M, and
    Cin=256/Cout=128 WITH bias 17.11M. Mosaic's scoped accounting runs
    up to ~2.2 MB above _vmem_resident_estimate on those measured
    points (pipelining double-buffers operands the estimate counts
    once), so the gate uses a 14 MB budget — 2 MB of margin below the
    hardware limit. Rejected shapes fall back to the XLA tap-grouped
    route; recalibrate against real compiles before loosening."""
    if cin % 32 and not allow_cinpad:
        return False
    if cout % 8:
        return False
    if w % 128 == 0:
        pass
    elif w >= 32 and 128 % w == 0:
        if d is not None and d % (128 // w):
            return False
    else:
        return False
    return _vmem_resident_estimate(cin, cout, dtype) <= 14 << 20


def _vmem_resident_estimate(cin: int, cout: int, dtype, bh: int = 8) -> int:
    """Worst-case VMEM tenancy of the conv3d_tlayout family at the default
    tiling, in bytes. Covers fwd AND the grad kernels (whose im2col/slab
    scratch scale with Cout instead of Cin) via max(cin, cout); the lane
    dim is always the folded 128 and the f32 depth accumulator is capped
    near 6 MB by the hc rule (conv3d_tlayout_fused)."""
    item = jnp.dtype(dtype).itemsize
    cin_p = ((cin + 31) // 32) * 32  # cinpad wrapper pads to the tile
    c_big = max(cin_p, cout)
    w_eff = 128
    weights = 3 * cout * 9 * cin_p * item
    im2col = 9 * c_big * bh * w_eff * item
    slab = 2 * (bh + 2) * c_big * w_eff * item  # double-buffered input
    acc = 6 << 20  # f32 revolving depth accumulator, hc-capped near 6MB
    # out block is hc*Cout*W at the conv dtype = acc * item / 12
    out_block = acc * item // 12
    bias_tile = cout * w_eff * 4
    return weights + im2col + slab + acc + out_block + bias_tile


def _build_rhs(sl, rhs, lane, *, bh, cin, w, w_seg):
    """Fill the im2col scratch: rhs[(dy,dx,ci), h*W+w] = sl[h+dy, ci, w+dx-1].

    dx taps are lane ROLLS of the whole slab with per-w_seg-segment edge
    masks (never a sub-128 lane slice); dy taps are major-dim reads;
    writes land at (dy*3+dx)*Cin sublane / h*W lane offsets (all
    tile-aligned under the supported() gate)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for dx in range(3):
        shift = 1 - dx
        if shift == 0:
            shifted = sl
        else:
            # Mosaic's lane rotate is 32-bit only ("Rotate with non-32-bit
            # data", tpu.dynamic_rotate on bf16 — real-v5e reject, r4 HW
            # session): roll sub-4-byte slabs in f32 and cast back, which
            # is exact (bf16 values round-trip through f32 unchanged)
            if sl.dtype.itemsize < 4:
                shifted = pltpu.roll(
                    sl.astype(jnp.float32), shift=shift % w, axis=2
                ).astype(sl.dtype)
            else:
                shifted = pltpu.roll(sl, shift=shift % w, axis=2)
            if shift > 0:
                shifted = jnp.where(lane >= shift, shifted, 0)
            else:
                shifted = jnp.where(lane < w_seg + shift, shifted, 0)
        for h in range(bh):
            for dy in range(3):
                rhs[
                    pl.ds((dy * 3 + dx) * cin, cin),
                    pl.ds(h * w, w),
                ] = shifted[h + dy]


def _kernel(x_ref, w_ref, out_ref, slab, rhs, sem, *, bh, cin, cout, w, w_seg, hc):
    """Grid step = (n, z, H-chunk). In-kernel fori_loop over the chunk's
    bh-row strips with DOUBLE-BUFFERED halo DMAs (two slab slots, two DMA
    semaphores): strip j+1 streams in while strip j's im2col + matmul run.
    The grid-mapped out block gives the store side Pallas's own revolving
    buffers, so input DMA, MXU, and output DMA all overlap."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    z = pl.program_id(1)
    c = pl.program_id(2)
    nj = hc // bh  # strips per chunk (static)

    def strip_dma(slot, j):
        # [bh+2, Cin, W] H-strip with halo rows; H is a MAJOR dim of the
        # [N, D, Hp, C, W] source so any row offset is tile-aligned
        return pltpu.make_async_copy(
            x_ref.at[n, z, pl.ds(c * hc + j * bh, bh + 2)],
            slab.at[slot],
            sem.at[slot],
        )

    strip_dma(0, 0).start()

    # w_seg < w: the lane dim carries w//w_seg independent depth slices
    # side-by-side (lane folding); the edge mask then applies per SEGMENT
    # (lane % w_seg), which also zeroes the cross-segment roll leakage
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, cin, w), 2)
    if w_seg != w:
        lane = jax.lax.rem(lane, w_seg)

    def strip_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nj)
        def _():
            strip_dma(1 - slot, j + 1).start()

        strip_dma(slot, j).wait()
        _build_rhs(slab[slot], rhs, lane, bh=bh, cin=cin, w=w, w_seg=w_seg)

        # ONE deep-K matmul: [kd*Cout, 9*Cin] @ [9*Cin, bh*W]
        y = jax.lax.dot_general(
            w_ref[...],
            rhs[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for h in range(bh):
            out_ref[0, 0, j * bh + h] = y[:, h * w : (h + 1) * w].astype(
                out_ref.dtype
            )
        return 0

    jax.lax.fori_loop(0, nj, strip_body, 0)


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
    if w % 128 != 0 and w >= 32 and 128 % w == 0 and d % (128 // w) == 0:
        fold = 128 // w
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

    # H-chunk per grid step: as large as a ~4MB out block allows (fewer
    # chunk boundaries = deeper in-kernel DMA pipeline), multiple of bh
    itemsize = x_t.dtype.itemsize
    row_bytes = 3 * cout * w * itemsize
    hc = max(bh, min(h, (4 << 20) // max(row_bytes, 1) // bh * bh))
    while h % hc != 0:  # need an exact grid split
        hc -= bh
    assert hc >= bh and hc % bh == 0 and h % hc == 0, (h, bh, hc)

    kern = partial(_kernel, bh=bh, cin=cin, cout=cout, w=w, w_seg=w_seg, hc=hc)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d_k, h, 3 * cout, w), x_t.dtype),
        grid=(n, d_k, h // hc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hc, 3 * cout, w),
            lambda i, z, j: (i, z, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, cin, w), x_t.dtype),  # double-buffered
            pltpu.VMEM((9 * cin, bh * w), x_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
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


def _kernel_fused(
    x_ref, w_ref, b_ref, out_ref, slab, rhs, acc, sem,
    *, bh, cin, cout, w, w_seg, hc, d, use_bias, relu,
):
    """v2 grid step = (n, H-chunk, z): the depth shift-add happens IN VMEM.

    Per step z (< d): stream plane z's bh-row strips (double-buffered, v1's
    inner pipeline), build the same [9*Cin, bh*W] im2col rhs, run the same
    [3*Cout, 9*Cin] matmul — then ACCUMULATE the three dz contributions
    into a revolving 3-slot f32 accumulator (output plane o = z+1-dz,
    slot o%3) instead of writing y_pre to HBM. After accumulating, output
    plane z-1 is complete: flush it to the grid-mapped out block and zero
    its slot for reuse as plane z+2. Step z == d only flushes plane d-1.

    Folded shapes (w_seg < w, fold f = w//w_seg: f consecutive depth
    slices ride side-by-side in lanes): a dz=0/dz=2 contribution is a
    per-h lane ROLL by ±w_seg — the non-wrapped segments stay in this
    plane-group (depth neighbor within the fold), the wrapped segment is
    exactly the carry into plane-group z±1. With f == 1 the roll is the
    identity and the carry mask covers everything, which reduces to the
    plain full-block adds.

    Traffic: input read once, output written once — v1 pays an extra
    3x-write + 3x-read y_pre round trip through HBM for the XLA
    shift-add epilogue."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    c = pl.program_id(1)
    z = pl.program_id(2)
    nj = hc // bh  # strips per chunk (static)
    fold = w // w_seg

    def strip_dma(slot, j):
        return pltpu.make_async_copy(
            x_ref.at[n, z, pl.ds(c * hc + j * bh, bh + 2)],
            slab.at[slot],
            sem.at[slot],
        )

    @pl.when(z == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    lane = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, cin, w), 2)
    if w_seg != w:
        lane = jax.lax.rem(lane, w_seg)

    # lane index over one [Cout, w] y-row, for the fold carry masks
    ylane = jax.lax.broadcasted_iota(jnp.int32, (cout, w), 1)

    def add_guarded(o, j, h, val):
        """acc[o % 3, row] += val, iff output plane o is in range."""

        @pl.when(jnp.logical_and(o >= 0, o < d))
        def _():
            acc[jax.lax.rem(o, 3), j * bh + h] += val

    @pl.when(z < d)
    def _():
        strip_dma(0, 0).start()

        def strip_body(j, _):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < nj)
            def _():
                strip_dma(1 - slot, j + 1).start()

            strip_dma(slot, j).wait()
            _build_rhs(slab[slot], rhs, lane, bh=bh, cin=cin, w=w, w_seg=w_seg)
            y = jax.lax.dot_general(
                w_ref[...],
                rhs[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for dz in range(3):
                for h in range(bh):
                    blk = y[dz * cout : (dz + 1) * cout, h * w : (h + 1) * w]
                    if dz == 1:  # same depth: same group, same segment
                        add_guarded(z, j, h, blk)
                    elif fold == 1:
                        # whole block carries to the neighboring plane
                        add_guarded(z + 1 - dz, j, h, blk)
                    elif dz == 0:
                        # depth z+1: segment s -> s+1; wrap = carry to z+1
                        r = pltpu.roll(blk, shift=w_seg, axis=1)
                        add_guarded(z, j, h, jnp.where(ylane >= w_seg, r, 0))
                        add_guarded(z + 1, j, h, jnp.where(ylane < w_seg, r, 0))
                    else:  # dz == 2
                        # depth z-1: segment s -> s-1; wrap = carry to z-1
                        r = pltpu.roll(blk, shift=w - w_seg, axis=1)
                        lim = w - w_seg
                        add_guarded(z, j, h, jnp.where(ylane < lim, r, 0))
                        add_guarded(z - 1, j, h, jnp.where(ylane >= lim, r, 0))

            return 0

        jax.lax.fori_loop(0, nj, strip_body, 0)

    # output plane z-1 is now complete: flush (with the optional fused
    # bias + ReLU epilogue — the BN-folded eval path's whole Conv+BN+ReLU
    # then costs ONE output pass) and recycle the slot ((z+2) % 3 ==
    # (z-1) % 3 without negative arithmetic). At z == 0 the slot is
    # all-zero and the block lands on plane 0, which step z == 1 rewrites
    # with the real plane 0.
    sf = jax.lax.rem(z + 2, 3)
    val = acc[sf]
    if use_bias:
        val = val + b_ref[...]  # [hc, Cout, W] + [Cout, W]
    if relu:
        val = jnp.maximum(val, 0.0)
    out_ref[0, 0] = val.astype(out_ref.dtype)
    acc[sf] = jnp.zeros_like(acc[sf])


def conv3d_tlayout_fused(
    x_t: jnp.ndarray,
    kernel: jnp.ndarray,
    bh: int = None,
    bias: jnp.ndarray = None,
    relu: bool = False,
) -> jnp.ndarray:
    """v2: 3-D conv (k3 s1 SAME) in ONE Pallas kernel — the depth
    shift-add accumulates in VMEM across sequential z grid steps.

    x_t: [N, D, H, Cin, W] (T-layout); kernel: [3, 3, 3, Cin, Cout]
    (DHWIO). Returns [N, D, H, Cout, W]. W < 128 goes through the same
    depth-slice lane folding as v1; the kernel's fold-carry rolls keep
    the cross-depth accumulation exact across fold segments.

    ``bias``/``relu`` fuse the epilogue into the flush (f32 add before
    the output cast) — with BatchNorm folded into the weights this makes
    eval Conv+BN+ReLU a single kernel with one output pass (inference
    path; no VJP).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d, h, cin, w = x_t.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, 3), "k3 only"
    if bh is None:
        import os

        bh = int(os.environ.get("GMIST_TLAYOUT_BH", "8"))
    if h % bh != 0:
        bh = next(b for b in range(min(bh, h), 0, -1) if h % b == 0)

    w_seg, fold, d_k = w, 1, d
    if w % 128 != 0:
        assert w >= 32 and 128 % w == 0 and d % (128 // w) == 0, (
            "v2 folding needs W in {32, 64} with D % (128//W) == 0"
        )
        fold = 128 // w
        x_t = (
            x_t.reshape(n, d // fold, fold, h, cin, w)
            .transpose(0, 1, 3, 4, 2, 5)
            .reshape(n, d // fold, h, cin, fold * w)
        )
        d_k = d // fold
        w = fold * w

    xp = jnp.pad(x_t, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    w_flat = kernel.transpose(0, 4, 1, 2, 3).reshape(3 * cout, 9 * cin)

    # H-chunk: the f32 accumulator (3 x [hc, Cout, W]) is the big VMEM
    # tenant — size hc so it stays near ~6MB, multiple of bh
    acc_row = 3 * cout * w * 4
    hc = max(bh, min(h, (6 << 20) // max(acc_row, 1) // bh * bh))
    while h % hc != 0:
        hc -= bh
    assert hc >= bh and hc % bh == 0 and h % hc == 0, (h, bh, hc)

    # bias tile [Cout, W]: lane-broadcast outside the kernel (a [Cout]
    # 1-D operand is awkward in Mosaic); zeros when unused so the operand
    # list is static
    b_tile = (
        jnp.broadcast_to(bias.astype(jnp.float32)[:, None], (cout, w))
        if bias is not None
        else jnp.zeros((cout, w), jnp.float32)
    )
    kern = partial(
        _kernel_fused, bh=bh, cin=cin, cout=cout, w=w, w_seg=w_seg, hc=hc,
        d=d_k, use_bias=bias is not None, relu=relu,
    )
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d_k, h, cout, w), x_t.dtype),
        grid=(n, h // hc, d_k + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hc, cout, w),
            lambda i, c, z: (i, jax.lax.max(z - 1, 0), c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, cin, w), x_t.dtype),  # double-buffered
            pltpu.VMEM((9 * cin, bh * w), x_t.dtype),
            pltpu.VMEM((3, hc, cout, w), jnp.float32),  # revolving depth acc
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(xp, w_flat.astype(x_t.dtype), b_tile)
    if fold > 1:
        y = (
            y.reshape(n, d_k, h, cout, fold, w_seg)
            .transpose(0, 1, 4, 2, 3, 5)
            .reshape(n, d, h, cout, w_seg)
        )
    return y


def conv2d_plane_tlayout(
    x_t: jnp.ndarray, kernel: jnp.ndarray, bh: int = None
) -> jnp.ndarray:
    """2-D SAME k3s1 conv in T-layout — the 2-D zoo's shallow levels sit
    on the same K=Cin MXU ceiling as the 3-D nets (reference 2-D models,
    e.g. /root/reference/models/two_d/unet.py conv3x3 blocks).

    x_t: [N, H, C=Cin, W]; kernel: [3, 3, Cin, Cout] (HWIO). Returns
    [N, H, Cout, W]. Reuses the 3-D kernel with kd=1: the grid's depth
    extent is 1 and the weight matrix is [1*Cout, 9*Cin], so the matmul
    output **is** the conv output (no depth shift-add). W in [32, 128)
    folds BATCH slices into lanes (batches are independent, so the same
    per-segment edge masks make it exact) — needs N % (128//W) == 0.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, cin, w = x_t.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:2] == (3, 3), "k3 only"
    if bh is None:
        import os

        bh = int(os.environ.get("GMIST_TLAYOUT_BH", "8"))
    if h % bh != 0:
        bh = next(b for b in range(min(bh, h), 0, -1) if h % b == 0)

    # lane folding for W < 128: f = 128//W BATCH slices side-by-side
    w_seg, fold = w, 1
    if w % 128 != 0 and w >= 32 and 128 % w == 0 and n % (128 // w) == 0:
        fold = 128 // w
        x_t = (
            x_t.reshape(n // fold, fold, h, cin, w)
            .transpose(0, 2, 3, 1, 4)
            .reshape(n // fold, h, cin, fold * w)
        )
        n = n // fold
        w = fold * w

    xp = jnp.pad(x_t, ((0, 0), (1, 1), (0, 0), (0, 0)))[:, None]  # [N,1,Hp,C,W]
    w_flat = kernel.transpose(3, 0, 1, 2).reshape(cout, 9 * cin)  # kd=1 rows

    itemsize = x_t.dtype.itemsize
    row_bytes = cout * w * itemsize
    hc = max(bh, min(h, (4 << 20) // max(row_bytes, 1) // bh * bh))
    while h % hc != 0:
        hc -= bh
    assert hc >= bh and hc % bh == 0 and h % hc == 0, (h, bh, hc)

    kern = partial(_kernel, bh=bh, cin=cin, cout=cout, w=w, w_seg=w_seg, hc=hc)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 1, h, cout, w), x_t.dtype),
        grid=(n, 1, h // hc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hc, cout, w),
            lambda i, z, j: (i, z, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, cin, w), x_t.dtype),
            pltpu.VMEM((9 * cin, bh * w), x_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(xp, w_flat.astype(x_t.dtype))[:, 0]
    if fold > 1:
        y = (
            y.reshape(n, h, cout, fold, w_seg)
            .transpose(0, 3, 1, 2, 4)
            .reshape(n * fold, h, cout, w_seg)
        )
    return y


def _wgrad2d_tlayout(x_t: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dw[dy,dx,ci,co] via ONE relabeled-dims conv (batch=ci, feature=n),
    the 2-D analogue of _wgrad_tlayout."""
    dn = jax.lax.conv_dimension_numbers(x_t.shape, g.shape, ("CHNW", "IHOW", "NHCW"))
    dw = jax.lax.conv_general_dilated(
        x_t, g, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    return dw  # "NHCW": [ci, ky, co, kx]


@jax.custom_vjp
def conv2d_tlayout(x_t: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2-D conv, k=3, stride 1, SAME, T-layout [N, H, C, W] (custom VJP:
    Pallas dgrad on the flipped/transposed kernel; XLA relabeled wgrad)."""
    return conv2d_plane_tlayout(x_t, kernel)


def _conv2d_tlayout_fwd(x_t, kernel):
    return conv2d_tlayout(x_t, kernel), (x_t, kernel)


def _conv2d_tlayout_bwd(res, g):
    x_t, kernel = res
    k_flip = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv2d_tlayout(g.astype(x_t.dtype), k_flip)
    dwx = _wgrad2d_tlayout(x_t, g.astype(x_t.dtype))  # [ci, ky, co, kx]
    dw = dwx.transpose(1, 3, 0, 2).astype(kernel.dtype)  # [ky, kx, ci, co]
    return dx.astype(x_t.dtype), dw


conv2d_tlayout.defvjp(_conv2d_tlayout_fwd, _conv2d_tlayout_bwd)


def conv2d_tlayout_cinpad(x_t: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """conv2d_tlayout for any Cin (zero-pad to 32; see _pad_cin)."""
    cin = x_t.shape[2]
    pad = (-cin) % 32
    if pad:
        x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return conv2d_tlayout(x_t, kernel)


def _pad_cin(x_t: jnp.ndarray, kernel: jnp.ndarray):
    """Zero-pad the Cin (sublane) dim of x_t [N,D,H,Cin,W] and kernel
    [3,3,3,Cin,Cout] to a multiple of 32. Exact: zero channels contribute
    zero to the conv, dx flows back through pad's slicing transpose, and
    the wgrad rows of pad channels (all-zero inputs) are dropped by the
    kernel-pad's transpose."""
    cin = x_t.shape[3]
    pad = (-cin) % 32
    if pad:
        zeros3 = ((0, 0),) * 3
        x_t = jnp.pad(x_t, zeros3 + ((0, pad), (0, 0)))
        kernel = jnp.pad(kernel, zeros3 + ((0, pad), (0, 0)))
    return x_t, kernel


def conv3d_tlayout_cinpad(x_t: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """conv3d_tlayout for any Cin: misaligned Cin is zero-padded to 32
    outside the kernel (see ``supported(allow_cinpad=True)``). Pass-through
    when already aligned."""
    x_t, kernel = _pad_cin(x_t, kernel)
    return conv3d_tlayout(x_t, kernel)


def conv3d_tlayout_fused_cinpad(
    x_t: jnp.ndarray, kernel: jnp.ndarray, bh: int = None,
    bias: jnp.ndarray = None, relu: bool = False,
) -> jnp.ndarray:
    """conv3d_tlayout_fused (v2, eval epilogue fusion) for any Cin via the
    same zero-pad; bias/relu ride the Cout side and are unaffected."""
    x_t, kernel = _pad_cin(x_t, kernel)
    return conv3d_tlayout_fused(x_t, kernel, bh=bh, bias=bias, relu=relu)


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

    GMIST_TLAYOUT_V2=1 routes through the v2 fused kernel (depth
    shift-add accumulated in VMEM — no y_pre HBM round trip; folded
    W<128 shapes use fold-carry lane rolls); default is the v1 two-phase
    form. The HW A/B (scripts/bench_tlayout_conv.py) decides the promote.
    """
    import os

    if os.environ.get("GMIST_TLAYOUT_V2"):
        return conv3d_tlayout_fused(x_t, kernel)
    cout = kernel.shape[-1]
    y_pre = conv2d_tapcols_tlayout(x_t, kernel)
    return _shift_add_depth(y_pre, cout, x_t.dtype)


def _wgrad_kernel(
    x_ref, g_ref, out_ref, slab, gbuf, rhs, sem_x, sem_g, *, bh, cin, cout, w, d
):
    """dw accumulation: per (n, z) grid step, rebuild the fwd's im2col rhs
    per bh-strip and accumulate, for each depth tap dz, g[z-dz+1] @ rhs^T
    into the [3*Cout, 9*Cin] output block (constant index_map — the block
    stays resident and sums across the whole grid). Double-buffered x and
    g DMAs like the forward kernel. Out-of-range depth taps are fetched
    clamped and zeroed by a validity multiplier (cheaper than in-kernel
    control flow around the DMA)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    z = pl.program_id(1)
    nj = g_ref.shape[2] // bh  # strips per depth slice (static)

    def x_dma(slot, j):
        return pltpu.make_async_copy(
            x_ref.at[n, z, pl.ds(j * bh, bh + 2)], slab.at[slot], sem_x.at[slot]
        )

    def g_dma(slot, dz, j):
        zg = jnp.clip(z - dz + 1, 0, d - 1)
        return pltpu.make_async_copy(
            g_ref.at[n, zg, pl.ds(j * bh, bh)],
            gbuf.at[slot, dz],
            sem_g.at[slot, dz],
        )

    def start_all(slot, j):
        x_dma(slot, j).start()
        for dz in range(3):
            g_dma(slot, dz, j).start()

    start_all(0, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, cin, w), 2)
    valid = [
        jnp.logical_and(z - dz + 1 >= 0, z - dz + 1 < d).astype(jnp.float32)
        for dz in range(3)
    ]

    def strip_body(j, acc):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nj)
        def _():
            start_all(1 - slot, j + 1)

        x_dma(slot, j).wait()
        _build_rhs(slab[slot], rhs, lane, bh=bh, cin=cin, w=w, w_seg=w)
        for dz in range(3):
            g_dma(slot, dz, j).wait()
        parts = []
        for dz in range(3):
            part = jnp.zeros((cout, 9 * cin), jnp.float32)
            for h in range(bh):
                # [Cout, W] x [9*Cin, W] contracted on W (lanes)
                part = part + jax.lax.dot_general(
                    gbuf[slot, dz, h],
                    rhs[:, h * w : (h + 1) * w],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            parts.append(part * valid[dz])
        return acc + jnp.concatenate(parts, axis=0)

    acc = jax.lax.fori_loop(
        0, nj, strip_body, jnp.zeros((3 * cout, 9 * cin), jnp.float32)
    )

    @pl.when(jnp.logical_and(n == 0, z == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += acc


def wgrad_tapcols_tlayout(
    x_t: jnp.ndarray, g: jnp.ndarray, bh: int = None
) -> jnp.ndarray:
    """Weight gradient in Pallas: same T-layout im2col as the forward,
    accumulating ``g[z-dz+1] @ rhs(z)^T`` over the whole grid.

    x_t: [N, D, H, Cin, W]; g: [N, D, H, Cout, W] (cotangent of the conv
    output). Returns dw [3, 3, 3, Cin, Cout] in f32. W%128 only — the
    depth-tap pairing crosses fold boundaries, so lane-folded shapes keep
    the XLA wgrad (`_wgrad_tlayout`)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d, h, cin, w = x_t.shape
    cout = g.shape[3]
    assert w % 128 == 0, "folded shapes use the XLA wgrad"
    if bh is None:
        import os

        bh = int(os.environ.get("GMIST_TLAYOUT_BH", "8"))
    if h % bh != 0:
        bh = next(b for b in range(min(bh, h), 0, -1) if h % b == 0)

    xp = jnp.pad(x_t, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    kern = partial(_wgrad_kernel, bh=bh, cin=cin, cout=cout, w=w, d=d)
    dw_flat = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((3 * cout, 9 * cin), jnp.float32),
        grid=(n, d),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (3 * cout, 9 * cin), lambda i, z: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, cin, w), x_t.dtype),
            pltpu.VMEM((2, 3, bh, cout, w), g.dtype),
            pltpu.VMEM((9 * cin, bh * w), x_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=_INTERPRET,
    )(xp, g)
    # rows (dz, co), cols (dy, dx, ci) -> [dz, dy, dx, ci, co]
    return dw_flat.reshape(3, cout, 3, 3, cin).transpose(0, 2, 3, 4, 1)


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
    import os

    x_t, kernel = res
    # dgrad: correlate g with the spatially flipped, channel-transposed
    # kernel — the same Pallas kernel again (s1k3 SAME is self-adjoint)
    k_flip = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = conv3d_tlayout(g.astype(x_t.dtype), k_flip)
    # wgrad: GMIST_TLAYOUT_WGRAD=pallas re-uses the im2col kernel
    # (all-Pallas bwd); default is the relabeled-dims XLA conv — the HW
    # A/B (scripts/bench_tlayout_conv.py) decides which to promote
    if (
        os.environ.get("GMIST_TLAYOUT_WGRAD", "xla") == "pallas"
        and x_t.shape[-1] % 128 == 0
    ):
        dw = wgrad_tapcols_tlayout(x_t, g.astype(x_t.dtype)).astype(kernel.dtype)
    else:
        dwx = _wgrad_tlayout(x_t, g)  # "NDHCW" out: [ci, kz, ky, co, kx]
        dw = dwx.transpose(1, 2, 4, 0, 3).astype(kernel.dtype)  # [kz,ky,kx,ci,co]
    return dx.astype(x_t.dtype), dw


conv3d_tlayout.defvjp(_conv3d_tlayout_fwd, _conv3d_tlayout_bwd)


def to_tlayout(x: jnp.ndarray) -> jnp.ndarray:
    """[N, D, H, W, C] -> [N, D, H, C, W]."""
    return jnp.transpose(x, (0, 1, 2, 4, 3))


def from_tlayout(x_t: jnp.ndarray) -> jnp.ndarray:
    """[N, D, H, C, W] -> [N, D, H, W, C]."""
    return jnp.transpose(x_t, (0, 1, 2, 4, 3))
