"""On-device data augmentation: the reference's TorchIO training transform
stack as jitted JAX ops.

The host pipeline (data/transforms.py) reproduces tio semantics with
numpy/scipy at ~0.65 s per 160^3 volume on one core; here the SAME
transform family (RandomBiasField -> ZNormalization -> RandomNoise ->
RandomFlip(axis 0) -> OneOf{RandomAffine 0.8, RandomElasticDeformation
0.2}, reference dataloader.py:69-112) runs on the TPU, so
``data_backend=device`` works with ``config.aug=true`` and the whole
epoch — augmentation, patch gather, train step — can live in device
programs with no per-epoch host work.

Semantics match data/transforms.py transform-for-transform (same
parameter distributions, same interpolation orders: linear for images,
nearest for labels; same ITK B-spline mesh for elastic); only the RNG
stream differs (threefry here, numpy PCG64 there), exactly as the host
path already differs from TorchIO's torch RNG. Each transform is
verified against its scipy counterpart with identical parameters in
tests/test_device_aug.py.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates

from .transforms import _bspline_axis_matrix


def bias_field_from_coeffs(
    coeffs: jnp.ndarray, shape: Tuple[int, int, int]
) -> jnp.ndarray:
    """exp(poly) field from an [o, o, o] coefficient tensor (entries with
    exponent-sum > order are expected to be zero)."""
    o = coeffs.shape[0]
    powers = [
        jnp.stack([jnp.linspace(-1.0, 1.0, s) ** e for e in range(o)])
        for s in shape
    ]
    field = jnp.einsum("abc,ax,by,cz->xyz", coeffs, *powers)
    return jnp.exp(field).astype(jnp.float32)


def polynomial_bias_field(
    key: jax.Array, shape: Tuple[int, int, int], coefficients: float = 0.5,
    order: int = 3,
) -> jnp.ndarray:
    """exp(poly(order)) multiplicative bias field (tio.RandomBiasField).

    Monomials are separable: one [o+1]^3 coefficient tensor contracted
    with three per-axis power tables (transforms.py:RandomBiasField).
    """
    o = order + 1
    # draw a full cube of coefficients, mask the invalid (a+b+c > order)
    # combos to zero — keeps the draw count static for jit
    coeffs = jax.random.uniform(
        key, (o, o, o), minval=-coefficients, maxval=coefficients
    )
    a, b, c = jnp.meshgrid(*(jnp.arange(o),) * 3, indexing="ij")
    coeffs = jnp.where(a + b + c <= order, coeffs, 0.0)
    return bias_field_from_coeffs(coeffs, shape)


def znormalize(vol: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std over the whole volume (tio.ZNormalization)."""
    vol = vol.astype(jnp.float32)
    mean = jnp.mean(vol)
    std = jnp.std(vol)
    return (vol - mean) / jnp.where(std == 0, 1.0, std)


def random_noise(
    key: jax.Array, vol: jnp.ndarray, std_range: Tuple[float, float] = (0.0, 0.25)
) -> jnp.ndarray:
    """Additive Gaussian noise, std ~ U(std_range) (tio.RandomNoise)."""
    k_std, k_noise = jax.random.split(key)
    std = jax.random.uniform(k_std, (), minval=std_range[0], maxval=std_range[1])
    return vol + std * jax.random.normal(k_noise, vol.shape, jnp.float32)


def affine_matrix(
    scales: jnp.ndarray, degrees: jnp.ndarray, translation: jnp.ndarray,
    center: jnp.ndarray,
) -> jnp.ndarray:
    """4x4 voxel-space affine: rotate (deg, Rz@Ry@Rx) + scale about
    ``center``, then translate — transforms.py:_affine_matrix in jnp."""
    r = jnp.deg2rad(degrees)
    cx, cy, cz = jnp.cos(r[0]), jnp.cos(r[1]), jnp.cos(r[2])
    sx, sy, sz = jnp.sin(r[0]), jnp.sin(r[1]), jnp.sin(r[2])
    one, zero = jnp.ones(()), jnp.zeros(())
    Rx = jnp.stack(
        [jnp.stack([one, zero, zero]),
         jnp.stack([zero, cx, -sx]),
         jnp.stack([zero, sx, cx])]
    )
    Ry = jnp.stack(
        [jnp.stack([cy, zero, sy]),
         jnp.stack([zero, one, zero]),
         jnp.stack([-sy, zero, cy])]
    )
    Rz = jnp.stack(
        [jnp.stack([cz, -sz, zero]),
         jnp.stack([sz, cz, zero]),
         jnp.stack([zero, zero, one])]
    )
    R = Rz @ Ry @ Rx
    A = R * scales[None, :]  # R @ diag(scales)
    t = center - A @ center + translation
    M = jnp.concatenate([A, t[:, None]], axis=1)
    return jnp.concatenate([M, jnp.array([[0.0, 0, 0, 1]])], axis=0)


def _identity_grid(shape: Tuple[int, int, int]) -> jnp.ndarray:
    gx, gy, gz = jnp.meshgrid(
        *(jnp.arange(s, dtype=jnp.float32) for s in shape), indexing="ij"
    )
    return jnp.stack([gx, gy, gz])  # [3, X, Y, Z]


def resample(
    vol: jnp.ndarray, coords: jnp.ndarray, order: int, mode: str = "constant",
    cval=0.0,
) -> jnp.ndarray:
    """Per-channel map_coordinates; vol [C, X, Y, Z], coords [3, X, Y, Z].

    mode='constant' reproduces scipy's semantics (the host pipeline's
    reference): NO interpolation beyond the edges — any sample whose
    coordinate leaves [0, n-1] on some axis is exactly cval, never a
    cval/edge blend (jax's native 'constant' blends)."""
    coord_list = [coords[0], coords[1], coords[2]]
    if mode == "constant":
        fn = lambda ch: map_coordinates(ch, coord_list, order=order, mode="nearest")
        out = jax.vmap(fn)(vol.astype(jnp.float32))
        valid = jnp.ones(coords.shape[1:], bool)
        for i, n in enumerate(vol.shape[1:]):
            valid &= (coords[i] >= 0) & (coords[i] <= n - 1)
        return jnp.where(valid[None], out, cval)
    fn = lambda ch: map_coordinates(ch, coord_list, order=order, mode=mode, cval=cval)
    return jax.vmap(fn)(vol.astype(jnp.float32))


def affine_resample_pair(
    src: jnp.ndarray, gt: jnp.ndarray, M: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a 4x4 voxel-space affine M (output <- input via M^-1): linear
    for the image (pad = source min), nearest for the label (pad 0)."""
    shape = src.shape[1:]
    Minv = jnp.linalg.inv(M)
    grid = _identity_grid(shape)
    coords = jnp.einsum("ij,jxyz->ixyz", Minv[:3, :3], grid) + Minv[:3, 3][
        :, None, None, None
    ]
    pad_val = jnp.min(src)
    out_src = resample(src, coords, order=1, mode="constant", cval=pad_val)
    out_gt = jnp.rint(resample(gt, coords, order=0, mode="constant", cval=0.0))
    return out_src, out_gt


def random_affine_pair(
    key: jax.Array, src: jnp.ndarray, gt: jnp.ndarray,
    scales: float = 0.1, degrees: float = 10.0, translation: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tio.RandomAffine defaults: scale U(0.9,1.1), rot U(-10,10) deg,
    linear/nearest interpolation, pad value = source min
    (transforms.py:RandomAffine). src/gt: [C, X, Y, Z]."""
    ks, kd, kt = jax.random.split(key, 3)
    sc = jax.random.uniform(ks, (3,), minval=1 - scales, maxval=1 + scales)
    dg = jax.random.uniform(kd, (3,), minval=-degrees, maxval=degrees)
    tr = jax.random.uniform(kt, (3,), minval=-translation, maxval=translation)
    shape = src.shape[1:]
    center = (jnp.asarray(shape, jnp.float32) - 1) / 2.0
    return affine_resample_pair(src, gt, affine_matrix(sc, dg, tr, center))


@lru_cache(maxsize=None)
def _bspline_bases(shape: Tuple[int, int, int], num_cp: int):
    """Static per-axis cubic B-spline basis matrices (tiny numpy constants).

    MUST cache numpy, never jnp: jnp.asarray under an active trace returns
    a tracer, and an lru_cache that captures one poisons every later trace
    with an UnexpectedTracerError (order-dependent suite failure, r3)."""
    return tuple(
        np.asarray(_bspline_axis_matrix(s, num_cp), np.float32) for s in shape
    )


def elastic_displacement(
    grid: jnp.ndarray, shape: Tuple[int, int, int]
) -> jnp.ndarray:
    """[3, n, n, n] control coefficients -> [3, *shape] voxel displacement
    (exact ITK-mesh tensor-product cubic B-spline; same math as
    transforms.py:RandomElasticDeformation.displacement_field)."""
    bx, by, bz = _bspline_bases(tuple(shape), grid.shape[1])
    d = jnp.einsum("xi,aijk->axjk", bx, grid)
    d = jnp.einsum("yj,axjk->axyk", by, d)
    return jnp.einsum("zk,axyk->axyz", bz, d).astype(jnp.float32)


def elastic_resample_pair(
    src: jnp.ndarray, gt: jnp.ndarray, grid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a control-point displacement grid: linear image / nearest label,
    edge-clamped sampling (scipy mode='nearest' equivalent)."""
    shape = src.shape[1:]
    coords = _identity_grid(shape) + elastic_displacement(grid, shape)
    out_src = resample(src, coords, order=1, mode="nearest")
    out_gt = jnp.rint(resample(gt, coords, order=0, mode="nearest"))
    return out_src, out_gt


def random_elastic_pair(
    key: jax.Array, src: jnp.ndarray, gt: jnp.ndarray,
    num_control_points: int = 7, max_displacement: float = 7.5,
    locked_borders: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tio.RandomElasticDeformation defaults: 7^3 control points, max disp
    7.5, 2 locked border layers; exact ITK-mesh tensor-product cubic
    B-spline field (transforms.py:RandomElasticDeformation)."""
    n = num_control_points
    grid = jax.random.uniform(
        key, (3, n, n, n), minval=-max_displacement, maxval=max_displacement
    )
    mask = np.zeros((n,), bool)
    mask[locked_borders : n - locked_borders] = True
    m = jnp.asarray(mask[:, None, None] & mask[None, :, None] & mask[None, None, :])
    grid = jnp.where(m[None], grid, 0.0)
    return elastic_resample_pair(src, gt, grid)


def random_flip_pair(
    key: jax.Array, src: jnp.ndarray, gt: jnp.ndarray, axis: int = 0,
    p: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tio.RandomFlip(axes=(0,)): spatial axis 0 with probability 0.5."""
    do = jax.random.uniform(key) < p
    flip = lambda v: jnp.where(do, jnp.flip(v, axis=axis + 1), v)
    return flip(src), flip(gt)


def augment_pair(key: jax.Array, src: jnp.ndarray, gt: jnp.ndarray):
    """Full training augmentation (reference dataloader.py:69-93 order):
    BiasField -> ZNorm -> Noise -> Flip(0) -> OneOf{Affine 0.8, Elastic 0.2}.

    src/gt: [C, X, Y, Z] float32. Jit-safe; one branch of the OneOf runs
    per trace via lax.cond.
    """
    k_bias, k_noise, k_flip, k_pick, k_spatial = jax.random.split(key, 5)
    shape = src.shape[1:]
    src = src.astype(jnp.float32) * polynomial_bias_field(k_bias, shape)[None]
    src = znormalize(src)
    src = random_noise(k_noise, src)
    src, gt = random_flip_pair(k_flip, src, gt)
    use_affine = jax.random.uniform(k_pick) < 0.8
    src, gt = jax.lax.cond(
        use_affine,
        lambda s, g: random_affine_pair(k_spatial, s, g),
        lambda s, g: random_elastic_pair(k_spatial, s, g),
        src, gt,
    )
    return src, gt
