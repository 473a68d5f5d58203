"""Sliding-window predict: TorchIO-parity aggregation through the
single-dispatch scan path."""

import jax
import jax.numpy as jnp
import numpy as np

from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (
    sliding_window_predict,
)


def _threshold_forward(variables, tiles):
    """A 'model' whose argmax mask is (tile > 0): logits ch1 = x, ch0 = 0."""
    del variables
    zeros = jnp.zeros_like(tiles[..., :1])
    return jnp.concatenate([zeros, tiles[..., :1]], axis=-1)


def test_sliding_window_equals_direct_threshold():
    """With a pointwise model, tiled+aggregated == whole-volume result."""
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(1, 24, 20, 28)).astype(np.float32)
    mask = sliding_window_predict(
        _threshold_forward, {}, vol, (12, 12, 12), (4, 4, 4), batch_size=3
    )
    expected = (vol > 0).astype(np.int32)
    np.testing.assert_array_equal(mask, expected)


def test_sliding_window_batch_padding():
    """Tile count not divisible by batch_size still covers everything."""
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    for bs in (1, 2, 5, 7):
        mask = sliding_window_predict(
            _threshold_forward, {}, vol, (12, 12, 12), (4, 4, 4), batch_size=bs
        )
        np.testing.assert_array_equal(mask, (vol > 0).astype(np.int32))


def test_mean_logits_blend_matches_pointwise():
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(1, 20, 20, 20)).astype(np.float32)
    mask = sliding_window_predict(
        _threshold_forward, {}, vol, (12, 12, 12), (4, 4, 4),
        batch_size=3, overlap_mode="mean_logits",
    )
    np.testing.assert_array_equal(mask, (vol > 0).astype(np.int32))
