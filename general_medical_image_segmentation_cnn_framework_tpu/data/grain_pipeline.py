"""Grain-backed patch pipeline (multiprocess prefetch, per-host sharding).

The threaded ``PatchQueueDataset`` is the default; this module provides the
Grain formulation named in BASELINE.json — a ``RandomAccessDataSource`` of
(subject, sample) indices feeding a ``RandomMapTransform`` that loads (with
caching), transforms, and crops a uniform patch, batched and prefetched by
Grain's multiprocess DataLoader, sharded per host for multi-process
training (``ShardByJaxProcess``).

Same sampler semantics as the reference's tio.Queue(samples_per_volume)
(/root/reference/dataloader.py:52-67): an epoch is subjects x
samples_per_volume uniform random patches.

Select with ``config.data_backend=grain`` (default: ``threaded``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .pipeline import get_subjects, load_subject
from .transforms import Transform, build_transform


class _PatchSource:
    """RandomAccessDataSource of (subject_idx, sample_idx) pairs."""

    def __init__(self, n_subjects: int, samples_per_volume: int):
        self._len = n_subjects * samples_per_volume
        self.samples_per_volume = samples_per_volume

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, idx: int) -> int:
        return int(idx)


class GrainPatchDataset:
    """Iterable of (x, y) NDHWC batches via Grain's DataLoader."""

    def __init__(
        self,
        config,
        is_train: bool = True,
        transform: Optional[Transform] = None,
        worker_count: int = 0,
    ):
        import grain.python as gp

        self.config = config
        self.pairs = get_subjects(config)
        if not self.pairs:
            raise FileNotFoundError(
                f"no .nii.gz pairs found under {config.data_path} / {config.gt_path}"
            )
        self.patch_size = tuple(config.patch_size)
        self.batch_size = int(config.batch_size)
        self.samples_per_volume = int(getattr(config, "samples_per_volume", 10))
        self.transform = transform or build_transform(config, is_train)
        self.seed = int(getattr(config, "seed", 0) or 0)
        self._gp = gp
        self._worker_count = worker_count
        self._cache: dict = {}
        self._epoch = 0

    def __len__(self) -> int:
        return (len(self.pairs) * self.samples_per_volume) // self.batch_size

    def _make_record(self, idx: int, rng: np.random.Generator):
        subject_idx = idx // self.samples_per_volume
        if subject_idx not in self._cache:
            self._cache[subject_idx] = load_subject(self.pairs[subject_idx])
        subject = self.transform(self._cache[subject_idx].copy(), rng)
        src, gt = subject.source.data, subject.gt.data
        shape = src.shape[1:]
        origin = tuple(
            int(rng.integers(0, s - p + 1)) for s, p in zip(shape, self.patch_size)
        )
        sl = tuple(slice(o, o + p) for o, p in zip(origin, self.patch_size))
        x = np.moveaxis(src[(slice(None),) + sl], 0, -1).astype(np.float32)
        y = np.moveaxis(gt[(slice(None),) + sl], 0, -1).astype(np.float32)
        return {"x": x, "y": y}

    def __iter__(self):
        gp = self._gp
        outer = self

        class _Sample(gp.RandomMapTransform):
            def random_map(self, record, rng):
                # grain hands a np.random.Generator per record
                return outer._make_record(record, rng)

        source = _PatchSource(len(self.pairs), self.samples_per_volume)
        sampler = gp.IndexSampler(
            num_records=len(source),
            shard_options=gp.ShardByJaxProcess(drop_remainder=True),
            shuffle=True,
            seed=self.seed + self._epoch,
            num_epochs=1,
        )
        self._epoch += 1
        loader = gp.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[_Sample(), gp.Batch(self.batch_size, drop_remainder=True)],
            worker_count=self._worker_count,
        )
        for batch in loader:
            yield batch["x"], batch["y"]


def make_dataset(config, is_train: bool = True):
    """Pipeline factory honoring ``config.data_backend``
    (threaded | grain | device)."""
    backend = getattr(config, "data_backend", "threaded")
    if backend == "grain":
        return GrainPatchDataset(
            config, is_train=is_train,
            worker_count=int(getattr(config, "grain_workers", 0)),
        )
    if backend == "device":
        from .device_prep import DeviceDatasetBudgetError, DevicePatchDataset

        try:
            return DevicePatchDataset(config, is_train=is_train)
        except DeviceDatasetBudgetError as e:
            import logging

            logging.getLogger(__name__).warning(
                "%s — falling back to the threaded backend", e
            )
    from .pipeline import PatchQueueDataset

    return PatchQueueDataset(config, is_train=is_train)
