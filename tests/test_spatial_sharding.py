"""Halo-exchange spatially-sharded conv == unsharded conv (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from general_medical_image_segmentation_cnn_framework_tpu.ops.conv3d import (
    conv3d_decomposed,
)
from general_medical_image_segmentation_cnn_framework_tpu.parallel.spatial import (
    spatial_conv3d,
)


def test_spatial_conv_matches_unsharded():
    mesh = Mesh(np.asarray(jax.devices()), ("spatial",))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 8, 8, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))

    want = conv3d_decomposed(x, kernel, (1, 1, 1), (1, 1, 1))
    got = spatial_conv3d(x, kernel, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_spatial_conv_k5():
    mesh = Mesh(np.asarray(jax.devices()), ("spatial",))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 6, 6, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(5, 5, 5, 2, 4)).astype(np.float32))
    want = conv3d_decomposed(x, kernel, (1, 1, 1), (2, 2, 2))
    got = spatial_conv3d(x, kernel, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
