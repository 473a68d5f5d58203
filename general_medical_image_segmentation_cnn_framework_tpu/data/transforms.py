"""Host-side volume transforms with TorchIO-equivalent semantics.

The reference composes (when ``config.aug``):
RandomBiasField -> ZNormalization -> RandomNoise -> RandomFlip(axis 0) ->
OneOf{RandomAffine 0.8, RandomElasticDeformation 0.2}; otherwise just
ZNormalization (/root/reference/dataloader.py:69-112).

Intensity transforms (bias field, noise, z-norm) apply only to the source
image; spatial transforms apply to source (linear interpolation) and label
(nearest). All transforms consume an explicit ``np.random.Generator`` so the
pipeline is reproducible under ``config.seed``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

from .io import Volume


class Subject:
    """A source/gt pair of co-registered volumes (cf. tio.Subject usage at
    /root/reference/dataloader.py:44-47)."""

    def __init__(self, source: Volume, gt: Optional[Volume] = None):
        self.source = source
        self.gt = gt

    @property
    def spatial_shape(self) -> Tuple[int, int, int]:
        return self.source.spatial_shape

    def copy(self) -> "Subject":
        return Subject(self.source.copy(), self.gt.copy() if self.gt is not None else None)


class Transform:
    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        raise NotImplementedError


class Compose(Transform):
    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        for t in self.transforms:
            subject = t(subject, rng)
        return subject


class OneOf(Transform):
    """Weighted random choice between transforms (tio.OneOf)."""

    def __init__(self, weighted: Dict[Transform, float]):
        self.transforms = list(weighted.keys())
        w = np.asarray(list(weighted.values()), dtype=np.float64)
        self.probs = w / w.sum()

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        idx = rng.choice(len(self.transforms), p=self.probs)
        return self.transforms[idx](subject, rng)


class ZNormalization(Transform):
    """(x - mean) / std over the whole image; source only (tio.ZNormalization
    with default masking, reference dataloader.py:84,100,109)."""

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        data = subject.source.data.astype(np.float32)
        mean = data.mean()
        std = data.std()
        if std == 0:
            std = 1.0
        subject.source.data = (data - mean) / std
        return subject

    # Also usable without a Subject/rng for the predict path:
    def normalize_array(self, data: np.ndarray) -> np.ndarray:
        data = data.astype(np.float32)
        std = data.std()
        return (data - data.mean()) / (std if std != 0 else 1.0)


class RandomNoise(Transform):
    """Additive Gaussian noise: mean 0, std ~ U(0, 0.25) (tio defaults)."""

    def __init__(self, mean: float = 0.0, std: Tuple[float, float] = (0.0, 0.25)):
        self.mean = mean
        self.std = std

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        std = rng.uniform(*self.std)
        noise = rng.normal(self.mean, std, size=subject.source.data.shape)
        subject.source.data = subject.source.data.astype(np.float32) + noise.astype(np.float32)
        return subject


class RandomFlip(Transform):
    """Flip along the given spatial axes with probability 0.5 each
    (tio.RandomFlip(axes=(0,)), reference dataloader.py:87)."""

    def __init__(self, axes: Sequence[int] = (0,), flip_probability: float = 0.5):
        self.axes = tuple(axes)
        self.p = flip_probability

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        for axis in self.axes:
            if rng.uniform() < self.p:
                subject.source.data = np.flip(subject.source.data, axis=axis + 1).copy()
                if subject.gt is not None:
                    subject.gt.data = np.flip(subject.gt.data, axis=axis + 1).copy()
        return subject


class RandomBiasField(Transform):
    """Multiplicative polynomial bias field, exp(poly(order 3)) with
    coefficients ~ U(-0.5, 0.5) (tio.RandomBiasField defaults)."""

    def __init__(self, coefficients: float = 0.5, order: int = 3):
        self.coefficients = coefficients
        self.order = order

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        shape = subject.source.spatial_shape
        ranges = [np.linspace(-1.0, 1.0, s, dtype=np.float32) for s in shape]
        x, y, z = np.meshgrid(*ranges, indexing="ij")
        field = np.zeros(shape, dtype=np.float32)
        for xo in range(self.order + 1):
            for yo in range(self.order + 1 - xo):
                for zo in range(self.order + 1 - xo - yo):
                    coeff = rng.uniform(-self.coefficients, self.coefficients)
                    field += coeff * (x**xo) * (y**yo) * (z**zo)
        field = np.exp(field)
        subject.source.data = subject.source.data.astype(np.float32) * field[None]
        return subject


def _affine_matrix(
    scales: np.ndarray, degrees: np.ndarray, translation: np.ndarray, center: np.ndarray
) -> np.ndarray:
    """Build a 4x4 voxel-space affine: rotate (deg, xyz order) + scale about
    ``center``, then translate."""
    rx, ry, rz = np.deg2rad(degrees)
    cx, cy, cz = np.cos([rx, ry, rz])
    sx, sy, sz = np.sin([rx, ry, rz])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = Rz @ Ry @ Rx
    S = np.diag(scales)
    M = np.eye(4)
    M[:3, :3] = R @ S
    M[:3, 3] = center - M[:3, :3] @ center + translation
    return M


class RandomAffine(Transform):
    """Random scale/rotate/translate (tio.RandomAffine defaults:
    scales 0.1 -> U(0.9, 1.1), degrees 10, translation 0; linear interp for
    images, nearest for labels, reference dataloader.py:89)."""

    def __init__(
        self,
        scales: float = 0.1,
        degrees: float = 10.0,
        translation: float = 0.0,
    ):
        self.scales = scales
        self.degrees = degrees
        self.translation = translation

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        scales = rng.uniform(1 - self.scales, 1 + self.scales, size=3)
        degrees = rng.uniform(-self.degrees, self.degrees, size=3)
        translation = rng.uniform(-self.translation, self.translation, size=3)
        center = (np.asarray(subject.spatial_shape, dtype=np.float64) - 1) / 2.0
        M = _affine_matrix(scales, degrees, translation, center)
        # ndimage.affine_transform maps output coords -> input coords: use inverse
        Minv = np.linalg.inv(M)

        def apply(vol: Volume, order: int, cval: float) -> None:
            out = np.empty_like(vol.data, dtype=np.float32)
            for c in range(vol.data.shape[0]):
                out[c] = ndimage.affine_transform(
                    vol.data[c].astype(np.float32),
                    Minv[:3, :3],
                    offset=Minv[:3, 3],
                    order=order,
                    mode="constant",
                    cval=cval,
                )
            vol.data = out

        pad_val = float(subject.source.data.min())
        apply(subject.source, order=1, cval=pad_val)
        if subject.gt is not None:
            apply(subject.gt, order=0, cval=0.0)
            subject.gt.data = np.rint(subject.gt.data).astype(np.float32)
        return subject


class RandomElasticDeformation(Transform):
    """Coarse-grid elastic deformation (tio defaults: 7^3 control points,
    max_displacement 7.5). Displacements on the control grid are upsampled
    with cubic splines and applied via map_coordinates — numerically close to
    (not bit-identical with) TorchIO's SimpleITK B-spline backend."""

    def __init__(self, num_control_points: int = 7, max_displacement: float = 7.5):
        self.num_control_points = num_control_points
        self.max_displacement = max_displacement

    def __call__(self, subject: Subject, rng: np.random.Generator) -> Subject:
        shape = subject.spatial_shape
        n = self.num_control_points
        grid = rng.uniform(-self.max_displacement, self.max_displacement, size=(3, n, n, n))
        # lock borders so the deformation vanishes at the edges (tio locks 2 border cps)
        grid[:, [0, -1], :, :] = 0
        grid[:, :, [0, -1], :] = 0
        grid[:, :, :, [0, -1]] = 0

        disp = np.stack(
            [
                ndimage.zoom(grid[i], [s / n for s in shape], order=3, mode="nearest")
                for i in range(3)
            ]
        )
        coords = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")
        sample = [coords[i] + disp[i].astype(np.float32) for i in range(3)]

        def apply(vol: Volume, order: int) -> None:
            out = np.empty_like(vol.data, dtype=np.float32)
            for c in range(vol.data.shape[0]):
                out[c] = ndimage.map_coordinates(
                    vol.data[c].astype(np.float32), sample, order=order, mode="nearest"
                )
            vol.data = out

        apply(subject.source, order=1)
        if subject.gt is not None:
            apply(subject.gt, order=0)
        return subject


def build_transform(config, is_train: bool = True) -> Transform:
    """The reference's transform factory (dataloader.py:69-112): aug pipeline
    when config.aug and training, else plain ZNormalization."""
    if is_train and getattr(config, "aug", False):
        return Compose(
            [
                RandomBiasField(),
                ZNormalization(),
                RandomNoise(),
                RandomFlip(axes=(0,)),
                OneOf({RandomAffine(): 0.8, RandomElasticDeformation(): 0.2}),
            ]
        )
    return Compose([ZNormalization()])
