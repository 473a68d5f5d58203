"""Paired A/B of augmented-training data paths on real hardware.

Measures end-to-end patches/s of `aug=true` training at 128^3 through:

  host   - threaded backend: scipy augmentation on the host producer
           (652 ms/volume after the r3 host-pipeline optimizations),
           patches shipped over the wire every epoch
  device - device backend: volumes RAW in HBM, the full augmentation
           stack fused with the patch gather on the TPU
           (data/device_aug.py); zero bytes cross the wire per epoch

Interleaved in one process (single runs on the tunneled transport vary
+-40%; paired comparisons are the only valid measurement — CLAUDE.md).
Uses a synthetic on-disk dataset so both backends exercise their real
loading path.
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

from general_medical_image_segmentation_cnn_framework_tpu.config import ConfigDict
from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
    Volume,
    write_nifti,
)


def make_dataset(root: Path, n_vols=2, shape=(160, 160, 160)):
    (root / "source").mkdir(parents=True, exist_ok=True)
    (root / "label").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_vols):
        img = rng.normal(size=(1,) + shape).astype(np.float32)
        lab = (img > 0.8).astype(np.float32)
        write_nifti(root / "source" / f"v{i}.nii.gz", Volume(img))
        write_nifti(root / "label" / f"v{i}.nii.gz", Volume(lab))


def build(root: Path, backend: str, patch=128, samples=10):
    import jax

    from general_medical_image_segmentation_cnn_framework_tpu.data.grain_pipeline import (
        make_dataset as make_loader,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
    from general_medical_image_segmentation_cnn_framework_tpu.parallel.mesh import (
        make_data_mesh,
        shard_batch,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import (
        init_train_state,
        make_train_step,
    )

    config = ConfigDict(
        {
            "network": "unet", "in_classes": 1, "out_classes": 2,
            "patch_size": (patch,) * 3, "init_lr": 1e-3,
            "init_type": "kaiming", "precision": "bfloat16", "seed": 0,
            "aug": True, "batch_size": 1, "samples_per_volume": samples,
            "data_path": str(root / "source"), "gt_path": str(root / "label"),
            "data_backend": backend,
        }
    )
    model = build_model(config)
    rng = jax.random.PRNGKey(0)
    params, stats, opt, tx = init_train_state(config, model, rng)
    step = make_train_step(config, model, tx)
    dataset = make_loader(config, is_train=True)
    mesh = make_data_mesh("data=-1", 1)
    state = [params, stats, opt]

    def run_epoch():
        p, s, o = state
        n = 0
        t0 = time.perf_counter()
        for x, y in dataset:
            if backend != "device":
                b = shard_batch(mesh, {"x": np.asarray(x), "y": np.asarray(y)})
                x, y = b["x"], b["y"]
            p, s, o, loss, dice = step(p, s, o, x, y, rng)
            n += int(x.shape[0])
        _ = float(loss)  # hard sync
        state[:] = [p, s, o]
        return n / (time.perf_counter() - t0)

    return run_epoch


def main():
    import os

    import jax

    plat = os.environ.get("GMIST_PLATFORM")
    if plat:  # CPU smoke runs while the tunnel is down
        jax.config.update("jax_platforms", plat)
    patch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(f"devices: {jax.devices()}", flush=True)
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        make_dataset(root)
        runs = {}
        for backend in ("device", "threaded"):
            print(f"build {backend}...", flush=True)
            runs[backend] = build(root, backend, patch=patch)
            rate = runs[backend]()  # compile + warm epoch
            print(f"  warm epoch: {rate:.2f} patches/s", flush=True)
        for rep in range(3):
            for backend in ("device", "threaded"):
                rate = runs[backend]()
                print(
                    f"aug=true {patch}^3 {backend}-backend rep{rep}: "
                    f"{rate:.2f} patches/s", flush=True,
                )


if __name__ == "__main__":
    main()
