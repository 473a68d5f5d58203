"""Data layer: volume I/O, transforms, and the patch pipeline.

TPU-first replacement for the reference's TorchIO stack
(/root/reference/dataloader.py): pure-numpy NIfTI/MHD readers+writers,
host-side transform pipeline with identical semantics, and a threaded
prefetching patch queue feeding NDHWC batches to the device.
"""

from .io import Volume, read_volume, write_volume, read_nifti, write_nifti, read_mhd, write_mhd
from .transforms import (
    Compose,
    CropOrPad,
    OneOf,
    RandomAffine,
    RandomBiasField,
    RandomElasticDeformation,
    RandomFlip,
    RandomNoise,
    Resample,
    RescaleIntensity,
    ToCanonical,
    ZNormalization,
    build_transform,
)
from .pipeline import Subject, get_subjects, PatchQueueDataset, grid_locations

__all__ = [
    "Volume",
    "read_volume",
    "write_volume",
    "read_nifti",
    "write_nifti",
    "read_mhd",
    "write_mhd",
    "Compose",
    "OneOf",
    "RandomAffine",
    "RandomBiasField",
    "RandomElasticDeformation",
    "RandomFlip",
    "RandomNoise",
    "ZNormalization",
    "build_transform",
    "Subject",
    "get_subjects",
    "PatchQueueDataset",
    "grid_locations",
]
