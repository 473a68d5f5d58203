"""Serving layer (serving.py): resident Predictor == batch predict path,
directory-watch serve loop, and jax.export AOT artifact roundtrips.

Capability extension — the reference has no serving story (its predict
driver rebuilds everything per invocation, /root/reference/predict.py)."""

import os

import numpy as np
import pytest

import jax

from general_medical_image_segmentation_cnn_framework_tpu.data.transforms import (
    ZNormalization,
)
from general_medical_image_segmentation_cnn_framework_tpu.models import build_model
from general_medical_image_segmentation_cnn_framework_tpu.serving import (
    Predictor,
    export_predictor,
    load_exported_predictor,
    serve,
)
from general_medical_image_segmentation_cnn_framework_tpu.train import (
    init_train_state,
)


def _variables(config):
    model = build_model(config)
    params, stats, _, _ = init_train_state(config, model, jax.random.PRNGKey(0))
    return model, {"params": params, "batch_stats": stats}


def _raw_volume(shape=(24, 24, 16), seed=3):
    r = np.random.default_rng(seed)
    return r.normal(0.5, 1.2, (1, *shape)).astype(np.float32)


@pytest.mark.quick
def test_predictor_matches_batch_path(tiny_config):
    """Predictor.predict_array == znorm + sliding_window_predict directly."""
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        sliding_window_predict,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.predict import (
        make_forward_fn,
    )

    model, variables = _variables(tiny_config)
    pred = Predictor(tiny_config, model=model, variables=variables)
    src = _raw_volume()

    got = pred.predict_array(src)

    forward = make_forward_fn(tiny_config, model)
    want = sliding_window_predict(
        forward, variables, ZNormalization().normalize_array(src),
        tiny_config.patch_size, (4, 4, 4), batch_size=2,
    )
    np.testing.assert_array_equal(got, want)

    # sync=False returns a thunk with identical output
    thunk = pred.predict_array(src, sync=False)
    np.testing.assert_array_equal(thunk(), want)


@pytest.mark.quick
def test_predictor_whole_volume_matches(tiny_config):
    from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
        whole_volume_predict,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.predict import (
        make_forward_fn,
    )

    tiny_config.whole_volume = True
    model, variables = _variables(tiny_config)
    pred = Predictor(tiny_config, model=model, variables=variables)
    src = _raw_volume()

    got = pred.predict_array(src)
    want = whole_volume_predict(
        make_forward_fn(tiny_config, model), variables,
        ZNormalization().normalize_array(src), pad_multiple=pred.wv_pad,
    )
    np.testing.assert_array_equal(got, want)
    assert got.shape == (1, 24, 24, 16)


def test_serve_once_writes_masks(tiny_config, tmp_path):
    """serve(once=True) predicts every volume in watch_dir and writes
    pred-<name> masks; already-processed files are not redone."""
    from general_medical_image_segmentation_cnn_framework_tpu.data.io import (
        Volume,
        read_volume,
        write_nifti,
    )
    from general_medical_image_segmentation_cnn_framework_tpu.train import train

    tiny_config.epochs = 1
    train(tiny_config)  # produces latest checkpoint
    tiny_config.ckpt = os.path.join(
        tiny_config.hydra_path, tiny_config.latest_checkpoint_file
    )

    watch = tmp_path / "incoming"
    watch.mkdir()
    for i in range(2):
        write_nifti(
            watch / f"case-{i}.nii.gz", Volume(_raw_volume(seed=10 + i))
        )
    tiny_config.watch_dir = str(watch)

    done = serve(tiny_config, once=True)
    assert sorted(done) == ["case-0.nii.gz", "case-1.nii.gz"]
    for name, out in done.items():
        mask = read_volume(out)
        assert mask.data.shape == (1, 24, 24, 16)
        assert set(np.unique(mask.data)) <= {0.0, 1.0}

    # second pass: nothing new to do, previously-done files stay done
    assert serve(tiny_config, once=True) == {}


@pytest.mark.quick
def test_export_roundtrip_sliding_window(tiny_config, tmp_path):
    """jax.export artifact replays the sliding-window scan byte-identically
    (includes the bit-packed binary mask path: Z=16 is 8-aligned)."""
    model, variables = _variables(tiny_config)
    pred = Predictor(tiny_config, model=model, variables=variables)
    src = _raw_volume()
    want = pred.predict_array(src)

    path = tmp_path / "unet_sw.jaxexport"
    export_predictor(pred, (24, 24, 16), path=path)
    fn = load_exported_predictor(path)
    got = fn(variables, ZNormalization().normalize_array(src))
    np.testing.assert_array_equal(got, want)


@pytest.mark.quick
def test_export_roundtrip_whole_volume(tiny_config, tmp_path):
    tiny_config.whole_volume = True
    model, variables = _variables(tiny_config)
    pred = Predictor(tiny_config, model=model, variables=variables)
    src = _raw_volume()
    want = pred.predict_array(src)

    blob = export_predictor(pred, (24, 24, 16))
    fn = load_exported_predictor(blob)
    got = fn(variables, ZNormalization().normalize_array(src))
    np.testing.assert_array_equal(got, want)
