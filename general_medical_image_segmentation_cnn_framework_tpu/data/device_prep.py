"""Device-side patch sampling: crop + normalize (+ augment) on the TPU.

The reference's pipeline crops and normalizes on the host and ships every
patch over PCIe (10 patches/volume/epoch => the volume crosses the wire
10x). Here each volume is placed in HBM ONCE and every epoch's patches
are gathered by a jitted vmapped ``dynamic_slice`` with device-side RNG —
host->device traffic drops from O(epochs * samples * patch^3) to
O(dataset size).

Enabled with ``config.data_backend=device``.

* aug=False: volumes are z-normalized once at load (BASELINE.json's
  "crop+normalize fused on-device").
* aug=True: volumes stay RAW in HBM; each epoch every volume runs the
  full training augmentation (data/device_aug.py — the tio stack as
  jitted JAX ops) fused with the patch gather in ONE program, at its
  TRUE shape. The ~0.65 s/volume of host scipy work becomes
  milliseconds of device time, and zero bytes cross the wire per epoch.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline import get_subjects, load_subject


class DeviceDatasetBudgetError(RuntimeError):
    """Dataset too large for HBM-resident device backend (device_dataset_gb)."""


@jax.jit
def _znorm_device(vol):
    """(x - mean) / std over the whole volume, on device (tio.ZNormalization)."""
    vol = vol.astype(jnp.float32)
    mean = jnp.mean(vol)
    std = jnp.std(vol)
    return (vol - mean) / jnp.where(std == 0, 1.0, std)


@partial(jax.jit, static_argnames=("patch_size", "n"))
def _sample_patches(src, gt, rng, patch_size, n):
    """n uniform random patches from one volume pair, gathered on device.

    src/gt: [X, Y, Z, C]. Returns (x [n, *patch, C], y [n, *patch, Cgt]).
    """
    shape = src.shape[:3]
    maxs = jnp.asarray([s - p for s, p in zip(shape, patch_size)], jnp.int32)
    origins = jax.vmap(
        lambda k: jax.random.randint(k, (3,), 0, maxs + 1)
    )(jax.random.split(rng, n))

    def gather(vol, o):
        return jax.lax.dynamic_slice(
            vol, (o[0], o[1], o[2], 0), patch_size + (vol.shape[-1],)
        )

    x = jax.vmap(partial(gather, src))(origins)
    y = jax.vmap(partial(gather, gt))(origins)
    return x, y


@partial(jax.jit, static_argnames=("patch_size", "n"))
def _augment_and_sample(src, gt, rng, patch_size, n):
    """Full augmentation + n-patch gather fused in one program.

    src/gt: RAW channels-last [X, Y, Z, C] volumes at their true shape
    (augmenting padded storage would skew the znorm statistics and pull
    padding into border voxels — this path never pads).
    """
    from .device_aug import augment_pair

    k_aug, k_patch = jax.random.split(rng)
    src_cf = jnp.moveaxis(src, -1, 0)
    gt_cf = jnp.moveaxis(gt, -1, 0)
    src_cf, gt_cf = augment_pair(k_aug, src_cf, gt_cf)
    return _sample_patches(
        jnp.moveaxis(src_cf, 0, -1), jnp.moveaxis(gt_cf, 0, -1),
        k_patch, patch_size, n,
    )


class DevicePatchDataset:
    """Iterable of on-device (x, y) batches; tio.Queue sampler semantics."""

    def __init__(self, config, is_train: bool = True):
        self.aug = bool(getattr(config, "aug", False)) and is_train
        self.config = config
        pairs = get_subjects(config)
        if not pairs:
            raise FileNotFoundError(
                f"no .nii.gz pairs found under {config.data_path} / {config.gt_path}"
            )
        self.patch_size = tuple(config.patch_size)
        self.batch_size = int(config.batch_size)
        self.samples_per_volume = int(getattr(config, "samples_per_volume", 10))
        self.seed = int(getattr(config, "seed", 0) or 0)
        self._epoch = 0

        # one-time H2D, channels-last in HBM: znormalized when aug is off,
        # RAW when aug is on (the device aug pipeline includes znorm after
        # the bias field, matching the host transform order).
        # Volumes are RESIDENT in HBM, so the whole dataset must fit:
        # load host-side first, check against config.device_dataset_gb,
        # and raise before any transfer if it can't (make_dataset catches
        # this and falls back to the threaded backend).
        budget = float(getattr(config, "device_dataset_gb", 8.0) or 0) * (1 << 30)
        host: List[Tuple[np.ndarray, np.ndarray]] = []
        total = 0
        for pair in pairs:
            subject = load_subject(pair)
            src = np.moveaxis(subject.source.data, 0, -1)
            gt = np.moveaxis(subject.gt.data, 0, -1).astype(np.float32)
            total += src.nbytes + gt.nbytes
            host.append((src, gt))
        if budget and total > budget:
            raise DeviceDatasetBudgetError(
                f"device data backend needs {total / (1 << 30):.2f} GB HBM "
                f"resident (> device_dataset_gb={budget / (1 << 30):.2f}); "
                "raise device_dataset_gb or use data_backend=threaded"
            )
        self.volumes: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        for src_h, gt_h in host:
            src = jnp.asarray(src_h)
            if not self.aug:
                src = _znorm_device(src)
            self.volumes.append((src, jnp.asarray(gt_h)))

    def __len__(self) -> int:
        return (len(self.volumes) * self.samples_per_volume) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        host_rng = np.random.default_rng(self.seed + self._epoch)
        key = jax.random.PRNGKey(self.seed + self._epoch)
        self._epoch += 1
        order = host_rng.permutation(len(self.volumes))

        pending_x, pending_y = [], []
        for idx in order:
            src, gt = self.volumes[int(idx)]
            key, sub = jax.random.split(key)
            sampler = _augment_and_sample if self.aug else _sample_patches
            x, y = sampler(
                src, gt, sub, self.patch_size, self.samples_per_volume
            )
            pending_x.append(x)
            pending_y.append(y)
            total = sum(p.shape[0] for p in pending_x)
            while total >= self.batch_size:
                xs = jnp.concatenate(pending_x) if len(pending_x) > 1 else pending_x[0]
                ys = jnp.concatenate(pending_y) if len(pending_y) > 1 else pending_y[0]
                yield xs[: self.batch_size], ys[: self.batch_size]
                pending_x = [xs[self.batch_size :]]
                pending_y = [ys[self.batch_size :]]
                total = pending_x[0].shape[0]
        # drop_last=True: leftovers discarded
