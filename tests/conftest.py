"""Test fixtures.

Multi-device testing uses JAX's host-platform device splitting: an 8-device
CPU mesh without hardware (the JAX-native answer to multi-node testing,
SURVEY §4). Env vars must be set before jax imports.
"""

import os

# Force-override: the driver environment pre-sets JAX_PLATFORMS to the real
# TPU (and its sitecustomize.py imports jax at interpreter start, freezing
# that env var into jax.config). Tests must run on the 8-device fake CPU
# mesh, so update the live config rather than the env.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

# Persistent XLA compilation cache: 3-D conv compiles on CPU are slow; cache
# them across test runs. Salt the directory with the host CPU's feature set:
# these sessions hop between machines, and an AOT executable compiled with
# another host's features fails at LOAD time mid-test ("Target machine
# feature +prefer-no-gather is not supported on the host machine", observed
# as a flaky JaxRuntimeError) — a per-machine dir makes reuse safe.
from general_medical_image_segmentation_cnn_framework_tpu.utils.machine import (
    machine_tag,
)

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GMIST_TEST_CACHE_DIR", f"/tmp/jax_test_cache_{machine_tag()}"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight test (e.g. the 128^3 VT-UNet oracle)"
    )
    config.addinivalue_line(
        "markers",
        "quick: conv-compile-free correctness subset — `pytest -m quick` "
        "runs <5 min even on a machine with a COLD XLA compile cache "
        "(3-D conv compiles dominate cold-suite cost; VERDICT r3 #9)",
    )


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """Tiny synthetic NIfTI dataset: 3 train + 2 test volumes of 32^3 with a
    bright ball as foreground."""
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
        Volume,
        write_nifti,
    )

    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)

    def make_volume(seed, shape=(32, 32, 32)):
        r = np.random.default_rng(seed)
        center = r.uniform(10, 22, size=3)
        radius = r.uniform(5, 9)
        coords = np.stack(
            np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        )
        dist = np.sqrt(((coords - center[:, None, None, None]) ** 2).sum(0))
        label = (dist < radius).astype(np.float32)
        image = label * 2.0 + r.normal(0, 0.3, shape).astype(np.float32)
        affine = np.diag([1.0, 1.5, 2.0, 1.0])
        return Volume(image[None], affine), Volume(label[None], affine)

    for split, count, offset in (("train", 3, 0), ("test", 2, 100)):
        (root / split / "source").mkdir(parents=True)
        (root / split / "label").mkdir(parents=True)
        for i in range(count):
            img, lab = make_volume(offset + i)
            write_nifti(root / split / "source" / f"vol-{i:02d}.nii.gz", img)
            write_nifti(root / split / "label" / f"vol-{i:02d}.nii.gz", lab)
    return root


@pytest.fixture()
def tiny_config(synthetic_dataset, tmp_path):
    """Composed config pointing at the synthetic dataset, tiny settings."""
    from general_medical_image_segmentation_cnn_framework_tpu.config import compose

    cfg = compose(
        [
            "config=unet",
            f"config.data_path={synthetic_dataset}/train/source",
            f"config.gt_path={synthetic_dataset}/train/label",
            f"config.pred_data_path={synthetic_dataset}/test/source",
            f"config.pred_gt_path={synthetic_dataset}/test/label",
            f"config.output_dir={tmp_path}/logs",
            "config.patch_size=16, 16, 16",
            "config.batch_size=2",
            "config.epochs=1",
            "config.samples_per_volume=4",
            "config.precision=float32",
            "config.patch_overlap=4, 4, 4",
            # no compilation_cache_dir: conftest already configured the
            # per-machine salted cache, and the driver keeps a pre-set dir
        ],
        job_name="train",
        make_run_dir=True,
    )
    return cfg


# ---------------------------------------------------------------------------
# XLA:CPU state isolation for the collective-heavy modules
# ---------------------------------------------------------------------------
#
# A full-suite run on a 1-core host aborted (SIGABRT) in an XLA:CPU
# collective rendezvous inside test_tp's trajectory test — after ~390
# green tests (r9). The same tests pass standalone AND in the 7-file
# feature slice (39 green in 12m37s on the same host): the abort needs
# the full run's accumulated in-process XLA state, exactly like the old
# monolithic multichip-dryrun body (fixed by per-stage subprocesses in
# __graft_entry__.py). pytest can't subprocess per module without new
# deps, so the next-best isolation: drop every cached executable before
# a collective-heavy module starts. Recompiles are cheap — the
# persistent per-machine cache above serves them back.

_COLLECTIVE_HEAVY = {
    "test_tp", "test_pp", "test_fsdp", "test_shardmap_dp", "test_parallel",
    "test_spatial_sharding", "test_sync_bn", "test_epoch_scan",
}


@pytest.fixture(autouse=True, scope="module")
def _isolate_collective_modules(request):
    if request.module.__name__ in _COLLECTIVE_HEAVY:
        import gc

        gc.collect()
        jax.clear_caches()
    yield
