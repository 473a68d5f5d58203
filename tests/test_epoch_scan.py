"""Whole-epoch lax.scan training path (epoch_scan + device backend)."""

import numpy as np
import pytest


def test_epoch_plan():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.epoch_scan import (
        build_epoch_plan,
    )

    rng = np.random.default_rng(0)
    vol_idx, origins = build_epoch_plan(3, 4, 2, (32, 32, 32), (16, 16, 16), rng)
    assert vol_idx.shape == (6, 2)
    assert origins.shape == (6, 2, 3)
    assert origins.min() >= 0 and origins.max() <= 16
    # every volume sampled samples_per_volume times
    counts = np.bincount(vol_idx.ravel(), minlength=3)
    assert (counts == 4).all()


def test_train_with_epoch_scan(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    tiny_config.epochs = 2
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0


def test_epoch_scan_requires_device_backend(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    # data_backend=device is the DEFAULT since r5, so pin the non-device
    # backend explicitly — epoch_scan must refuse it (the whole-epoch
    # program gathers patches from a device-resident volume store)
    tiny_config.data_backend = "threaded"
    tiny_config.epoch_scan = True
    with pytest.raises(AssertionError):
        train(tiny_config)


def test_epoch_plan_heterogeneous_shapes():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.epoch_scan import (
        build_epoch_plan,
    )

    rng = np.random.default_rng(1)
    shapes = np.asarray([(32, 32, 32), (24, 40, 20), (16, 16, 48)])
    vol_idx, origins = build_epoch_plan(3, 50, 2, shapes, (16, 16, 16), rng)
    # every origin within ITS volume's true extent (never in padding)
    maxs = shapes - 16
    for step in range(vol_idx.shape[0]):
        for b in range(vol_idx.shape[1]):
            v = vol_idx[step, b]
            assert (origins[step, b] >= 0).all()
            assert (origins[step, b] <= maxs[v]).all(), (v, origins[step, b])
    # sampling actually spans the extent (not pinned at 0)
    assert origins.max() > 0


def test_epoch_plan_rejects_too_small_volume():
    from general_medical_image_segmentation_cnn_framework_tpu.ops.epoch_scan import (
        build_epoch_plan,
    )

    rng = np.random.default_rng(2)
    shapes = np.asarray([(32, 32, 32), (12, 32, 32)])
    with pytest.raises(ValueError, match="smaller than patch"):
        build_epoch_plan(2, 4, 2, shapes, (16, 16, 16), rng)


def test_train_with_epoch_scan_heterogeneous(tiny_config, tmp_path):
    """End-to-end epoch_scan over volumes of DIFFERENT shapes (the r2
    restriction, now lifted via pad-to-max storage + true-extent plans)."""
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
        Volume, write_nifti,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    rng = np.random.default_rng(9)
    for i, shape in enumerate([(32, 32, 32), (24, 40, 20), (20, 24, 28)]):
        (tmp_path / "source").mkdir(exist_ok=True)
        (tmp_path / "label").mkdir(exist_ok=True)
        img = rng.normal(size=(1,) + shape).astype(np.float32)
        lab = (img > 0.5).astype(np.float32)
        write_nifti(tmp_path / "source" / f"v{i}.nii.gz", Volume(img))
        write_nifti(tmp_path / "label" / f"v{i}.nii.gz", Volume(lab))

    tiny_config.data_path = str(tmp_path / "source")
    tiny_config.gt_path = str(tmp_path / "label")
    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    tiny_config.epochs = 1
    result = train(tiny_config)
    assert np.isfinite(result["loss"])


def test_train_with_epoch_scan_aug(tiny_config):
    """aug=true folds the on-device augmentation into the epoch program."""
    import numpy as np

    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    tiny_config.aug = True
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0


def test_epoch_scan_aug_rejects_heterogeneous(tiny_config, tmp_path):
    import pytest

    from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
        Volume, write_nifti,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    rng = np.random.default_rng(11)
    for i, shape in enumerate([(32, 32, 32), (24, 40, 20)]):
        (tmp_path / "source").mkdir(exist_ok=True)
        (tmp_path / "label").mkdir(exist_ok=True)
        img = rng.normal(size=(1,) + shape).astype(np.float32)
        lab = (img > 0.5).astype(np.float32)
        write_nifti(tmp_path / "source" / f"v{i}.nii.gz", Volume(img))
        write_nifti(tmp_path / "label" / f"v{i}.nii.gz", Volume(lab))

    tiny_config.data_path = str(tmp_path / "source")
    tiny_config.gt_path = str(tmp_path / "label")
    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    tiny_config.aug = True
    with pytest.raises(ValueError, match="uniform volume shapes"):
        train(tiny_config)


def test_epoch_scan_data_parallel_matches_single_device(tiny_config, tmp_path):
    """epoch_scan with the batch dim sharded over the mesh's data axis
    (shard_epoch_plan) must reproduce the single-device trajectory — the
    sharding is a layout annotation, not a semantic change (GSPMD inserts
    the grad/BN all-reduces)."""
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    results = {}
    for name, mesh_shape in (("single", "data=1"), ("dp", "data=2")):
        tiny_config.data_backend = "device"
        tiny_config.epoch_scan = True
        tiny_config.epochs = 1
        tiny_config.mesh_shape = mesh_shape
        (tmp_path / name).mkdir(exist_ok=True)
        tiny_config.hydra_path = str(tmp_path / name)
        results[name] = train(tiny_config)

    # rtol: the grad all-reduce reassociates f32 sums, so per-step drift
    # (~1e-6) compounds over the epoch's 6 steps — measured ~3e-4 at 12
    np.testing.assert_allclose(
        results["dp"]["loss"], results["single"]["loss"], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        results["dp"]["dice"], results["single"]["dice"], rtol=1e-3, atol=1e-6
    )


def test_epoch_scan_with_dice_loss(tiny_config):
    """Non-default criteria run through the epoch scan (shared
    make_loss_and_metric)."""
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    tiny_config.loss = "bce+dice"
    result = train(tiny_config)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["dice"] <= 1.0


def test_epoch_scan_is_model(tiny_config):
    """IS (FFT band-split inputs, tuple output trained on out1) composes
    with the whole-epoch scan — make_forward handles the quirk in-graph."""
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.network = "IS"
    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    result = train(tiny_config)
    assert np.isfinite(result["loss"])


def test_epoch_scan_2d_network(tiny_config):
    """2-D nets (depth-1 slice adapter) run through the scan: the device
    patch gather samples (1, H, W) patches from the 3-D volumes."""
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.network = "unet2d"
    tiny_config.patch_size = (1, 16, 16)
    tiny_config.data_backend = "device"
    tiny_config.epoch_scan = True
    result = train(tiny_config)
    assert np.isfinite(result["loss"])


def test_epoch_scan_spatial_sharding_matches(tiny_config, tmp_path):
    """spatial_sharding composes with epoch_scan: every gathered patch's
    first spatial axis shards over the mesh inside the one-program epoch
    (the bs=1 scale-out story); trajectory == unsharded."""
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    results = {}
    for name, flag in (("plain", False), ("spatial", True)):
        tiny_config.data_backend = "device"
        tiny_config.epoch_scan = True
        tiny_config.spatial_sharding = flag
        (tmp_path / name).mkdir(exist_ok=True)
        tiny_config.hydra_path = str(tmp_path / name)
        results[name] = train(tiny_config)

    np.testing.assert_allclose(
        results["spatial"]["loss"], results["plain"]["loss"], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        results["spatial"]["dice"], results["plain"]["dice"], rtol=1e-3, atol=1e-6
    )
