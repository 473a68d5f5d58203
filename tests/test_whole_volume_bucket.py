"""Pin the whole-volume + shape_bucket interaction (advisor r2 finding).

Unlike the sliding-window bucket path (byte-identical by construction —
the tile grid follows the true extent), bucketed whole-volume inference
pads the volume to lcm(pad_multiple, bucket) BEFORE the single forward,
so voxels within the receptive-field radius of the true border see extra
zero-pad context. This test pins the contract:

* output is cropped back to the true extent (shape identical),
* every voxel farther than the receptive-field radius from the padded
  border is byte-identical to the unbucketed whole-volume result,
* (border voxels are allowed to differ — both are valid conv paddings).
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from general_medical_image_segmentation_cnn_framework_tpu.ops.sliding_window import (  # noqa: E402
    whole_volume_predict,
)


class _TinyConvNet:
    """2-layer k3 conv net => receptive-field radius 2 (stable callable)."""

    def __call__(self, variables, x):
        w1, w2 = variables["w1"], variables["w2"]
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        y = jax.nn.relu(y)
        return jax.lax.conv_general_dilated(
            y, w2, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


def test_whole_volume_bucket_interior_identical_border_pinned():
    rng = np.random.default_rng(3)
    variables = {
        "w1": jnp.asarray(rng.normal(size=(3, 3, 3, 1, 4)).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(size=(3, 3, 3, 4, 3)).astype(np.float32)),
    }
    net = _TinyConvNet()
    # 13x17x11: not a multiple of pad_multiple=4 nor of bucket=8
    shape = (13, 17, 11)
    vol = rng.normal(size=(1,) + shape).astype(np.float32)
    pm, bucket = 4, 8

    # unbucketed whole-volume: pad to pad_multiple only
    want = whole_volume_predict(net, variables, vol, pad_multiple=pm)

    # bucketed path, exactly as predict.py composes it: bucket-pad the
    # volume, pad_multiple=lcm(pm, bucket), crop back to true extent
    padded = tuple(-(-s // bucket) * bucket for s in shape)
    src = np.pad(vol, [(0, 0)] + [(0, p - s) for p, s in zip(padded, shape)])
    got = whole_volume_predict(
        net, variables, src, pad_multiple=math.lcm(pm, bucket)
    )[:, : shape[0], : shape[1], : shape[2]]

    assert got.shape == want.shape == (1,) + shape

    # Bucket padding is one-sided (appended at the high end of each axis),
    # so only voxels whose receptive field reaches past the true extent can
    # differ: everything below s - r must be byte-identical, including the
    # low-side border.
    r = 2  # two k3 convs
    inner = tuple(slice(0, s - r) for s in shape)
    np.testing.assert_array_equal(
        got[(slice(None),) + inner], want[(slice(None),) + inner]
    )
