"""Pallas fused conv3d(k3, s1) + folded-BatchNorm + ReLU (inference).

The BASELINE north star names "Pallas-fused conv3d+norm+activation
blocks". For inference, BatchNorm folds into the convolution's weights
(``fold_batchnorm``), so the whole (Conv -> BN -> ReLU) block becomes ONE
kernel: each grid step DMAs a 3-deep slab of the pre-padded volume from
HBM into VMEM, runs the 27 taps as [H*W, Cin] @ [Cin, Cout] MXU matmuls
accumulated in f32, applies bias + ReLU, and writes one output slab —
the input is read exactly once.

Status: correct in interpreter mode (tests) AND compiled+validated on a
real v5e (rel. err ~4e-3 from bf16). The hardware path requires Cin and
Cout to be lane multiples (% 128 == 0 — the deep-layer regime; Mosaic DMA
slices must cover tile-aligned extents, and the tap-column slices must be
lane-aligned). Measured on the tunneled v5e at 16x32x32x128ch: 4.76 ms =
3.0 TFLOPS — parity with XLA's jitted conv+bias+relu (4.81 ms), with the
BN fold included for free. The batched-taps formulation (one
[Hp*Wp, Cin] @ [Cin, 9*Cout] matmul per depth slab) was 1.54x over the
naive 27-matmul version. The production compute path remains
ops/conv3d.py's decomposed form (which also covers Cin < 128).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # test hook


def fold_batchnorm(
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into conv weights:
    y = scale*(conv(x)+b - mean)/sqrt(var+eps) + beta
      = conv(x; k*g) + (b - mean)*g + beta,  g = scale/sqrt(var+eps)."""
    g = bn_scale / jnp.sqrt(bn_var + eps)
    folded_kernel = kernel * g  # broadcast over [kd,kh,kw,cin,COUT]
    b = bias if bias is not None else 0.0
    folded_bias = (b - bn_mean) * g + bn_bias
    return folded_kernel, folded_bias


def _conv_block_kernel(x_ref, w_ref, b_ref, out_ref, scratch, sem, *, h, w, cin, cout, hp, wp, relu=True):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    d = pl.program_id(1)

    dma = pltpu.make_async_copy(
        # [3, Hp, Wp, Cin] slab; Wp 8-aligned, Cin 128-aligned so the DMA
        # covers full tile-aligned extents of the (sublane, lane) dims
        x_ref.at[n, pl.ds(d, 3)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # batched-taps formulation: ONE [Hp*Wp, Cin] @ [Cin, 9*Cout] matmul per
    # depth slab (full 1152-lane MXU occupancy), then 9 shifted output
    # accumulations. 1.54x over the naive 27-small-matmul version; the tap
    # column slices are lane-aligned (Cout % 128 == 0).
    acc = jnp.zeros((h, w, cout), jnp.float32)
    for dz in range(3):
        slab = scratch[dz]  # [Hp, Wp, Cin] value
        y_all = jnp.dot(
            slab.reshape(hp * wp, cin), w_ref[dz],
            preferred_element_type=jnp.float32,
        ).reshape(hp, wp, 9 * cout)
        for dy in range(3):
            for dx in range(3):
                tap = (dy * 3 + dx) * cout
                acc = acc + jax.lax.slice(
                    y_all, (dy, dx, tap), (dy + h, dx + w, tap + cout)
                )
    y = acc + b_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, 0] = y.astype(out_ref.dtype)


def fused_conv3d_bn_relu(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, relu: bool = True
) -> jnp.ndarray:
    """x: [N, D, H, W, Cin]; kernel: [3,3,3,Cin,Cout] (BN pre-folded);
    'same' padding, stride 1. Returns relu(conv(x)+bias), x.dtype."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    # Mosaic DMA constraint: slices must cover full, tile-aligned extents
    # of the (sublane, lane) dims -> W+2 padded to 8, Cin must be a lane
    # multiple (the deep-layer regime, where XLA's native conv3d is
    # weakest; interpret mode has no such constraint)
    if cin % 128 != 0 and not _INTERPRET:
        raise ValueError(
            f"fused_conv3d_bn_relu hardware path needs Cin % 128 == 0, got {cin}"
        )
    hp = h + 2
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, wp - w - 1), (0, 0)))

    # wcat[dz]: [Cin, 9*Cout], tap-major (dy, dx, cout) columns
    wcat = kernel.transpose(0, 3, 1, 2, 4).reshape(3, cin, 9 * cout)

    kern = partial(
        _conv_block_kernel, h=h, w=w, cin=cin, cout=cout, hp=hp, wp=wp, relu=relu
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d, h, w, cout), x.dtype),
        grid=(n, d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # padded volume stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, cout), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, hp, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(xp, wcat.astype(x.dtype), bias.reshape(1, -1).astype(jnp.float32))


def _conv_block_kernel_tiled(
    x_ref, w_ref, b_ref, out_ref, scratch, sem, *,
    th, w, cin, cout, cout_pad, wp, relu=True,
):
    """H-tiled, Cout-padded variant for the SHALLOW layers (Cout 32/64 at
    large spatial). Each tap's weight block is zero-padded to 128 lanes so
    every tap slice of the batched matmul is tile-aligned — sidestepping
    the confirmed Mosaic hang on 32/64-lane offsets at the cost of
    cout_pad/cout x matmul FLOPs (these layers are traffic-bound, so lane
    waste can still win). Grid: (n, d, h_tiles)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    d = pl.program_id(1)
    ht = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(d, 3), pl.ds(ht * th, th + 2)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((th, w, cout_pad), jnp.float32)
    for dz in range(3):
        slab = scratch[dz]  # [th+2, Wp, Cin]
        y_all = jnp.dot(
            slab.reshape((th + 2) * wp, cin), w_ref[dz],
            preferred_element_type=jnp.float32,
        ).reshape(th + 2, wp, 9 * cout_pad)
        for dy in range(3):
            for dx in range(3):
                tap = (dy * 3 + dx) * cout_pad  # 128-aligned lane offset
                acc = acc + jax.lax.slice(
                    y_all, (dy, dx, tap), (dy + th, dx + w, tap + cout_pad)
                )
    y = acc + b_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, 0, 0] = y.astype(out_ref.dtype)


def fused_conv3d_bn_relu_tiled(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    relu: bool = True,
    tile_h: int = 8,
) -> jnp.ndarray:
    """Pad-Cout-to-128 + H-tiled fused conv for shallow layers.

    x: [N, D, H, W, Cin]; kernel [3,3,3,Cin,Cout]; returns [N,D,H,W,128k]
    with the true channels in [..., :Cout] (caller slices) — the padded
    write keeps the store tile-aligned."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    cout_pad = -(-cout // 128) * 128
    assert h % tile_h == 0, (h, tile_h)
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, wp - w - 1), (0, 0)))

    # [3, Cin, 9*cout_pad], each tap's columns zero-padded to 128 lanes
    wpad = jnp.pad(kernel, ((0, 0),) * 4 + ((0, cout_pad - cout),))
    wcat = wpad.transpose(0, 3, 1, 2, 4).reshape(3, cin, 9 * cout_pad)

    bias_pad = jnp.pad(bias, (0, cout_pad - cout))
    kern = partial(
        _conv_block_kernel_tiled, th=tile_h, w=w, cin=cin, cout=cout,
        cout_pad=cout_pad, wp=wp, relu=relu,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, d, h // tile_h, tile_h, w, cout_pad), x.dtype),
        grid=(n, d, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, tile_h, w, cout_pad),
            lambda i, j, k: (i, j, k, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(xp, wcat.astype(x.dtype), bias_pad.reshape(1, -1).astype(jnp.float32))
    return out.reshape(n, d, h, w, cout_pad)


def eligible_pallas(cin: int, cout: int) -> bool:
    """Hardware-path constraints of the fused kernel (lane-aligned channels,
    the deep-layer regime). Interpret mode (tests) lifts them."""
    return _INTERPRET or (cin % 128 == 0 and cout % 128 == 0)


@partial(jax.custom_vjp, nondiff_argnums=())
def pallas_conv3d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """k3 s1 'same' conv3d through the Pallas kernel (no bias/ReLU), with a
    custom VJP so the training step's deep layers can use it: backward-data
    runs the same Pallas kernel on the rotated kernel; backward-weights
    reuses XLA's filter backprop of the tap-grouped conv2d
    (ops/conv3d.conv3d_tapgrouped — lanes = 3*Cout)."""
    cout = kernel.shape[-1]
    zero_bias = jnp.zeros((cout,), jnp.float32)
    return fused_conv3d_bn_relu(x, kernel, zero_bias, relu=False)


def _pallas_conv3d_fwd(x, kernel):
    return pallas_conv3d(x, kernel), (x, kernel)


def _pallas_conv3d_bwd(res, g):
    from .conv3d import conv3d_tapgrouped

    x, kernel = res
    # dx: 'same' correlation of g with the spatially-flipped,
    # channel-transposed kernel — shapes stay lane-aligned (Cout -> Cin)
    k_rot = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    cin = kernel.shape[3]
    zero_bias = jnp.zeros((cin,), jnp.float32)
    dx = fused_conv3d_bn_relu(
        g.astype(x.dtype), k_rot.astype(x.dtype), zero_bias, relu=False
    ).astype(x.dtype)
    # dw: linear in w, so the vjp graph contains only the filter backprop
    _, vjp_w = jax.vjp(
        lambda w: conv3d_tapgrouped(x, w, (1, 1, 1), (1, 1, 1)), kernel
    )
    (dw,) = vjp_w(g.astype(x.dtype))
    return dx, dw.astype(kernel.dtype)


pallas_conv3d.defvjp(_pallas_conv3d_fwd, _pallas_conv3d_bwd)


def reference_conv3d_bn_relu(x, kernel, bias):
    """Unfused reference composition for parity checks."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return jnp.maximum(y + bias.astype(y.dtype), 0.0)
