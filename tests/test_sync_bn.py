"""Cross-replica BatchNorm: the shard_map/axis_name path must equal
global-batch statistics (the sync_batchnorm capability, SURVEY §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from general_medical_image_segmentation_cnn_framework_tpu.nn.norm import BatchNorm


def test_shard_map_sync_bn_matches_global():
    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("data",))
    n = len(jax.devices())

    x = np.random.default_rng(0).normal(size=(n * 2, 4, 4, 4, 3)).astype(np.float32)

    # global-batch BN on one logical array
    bn_global = BatchNorm()
    variables = bn_global.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_global, upd_global = bn_global.apply(
        variables, jnp.asarray(x), mutable=["batch_stats"]
    )

    # per-shard BN with axis_name='data' inside shard_map
    bn_sync = BatchNorm(axis_name="data")
    sync_vars = bn_sync.init(jax.random.PRNGKey(0), jnp.asarray(x[: x.shape[0] // n]))

    def f(local_x):
        y, upd = bn_sync.apply(sync_vars, local_x, mutable=["batch_stats"])
        return y, upd["batch_stats"]["mean"], upd["batch_stats"]["var"]

    sharded = shard_map(
        f,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=(P("data"), P(), P()),
        check_vma=False,
    )
    x_dev = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    y_sync, mean_sync, var_sync = sharded(x_dev)

    np.testing.assert_allclose(np.asarray(y_sync), np.asarray(y_global), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mean_sync), np.asarray(upd_global["batch_stats"]["mean"]), atol=1e-5
    )
    # running var: unbiased correction uses the GLOBAL count under axis_name
    np.testing.assert_allclose(
        np.asarray(var_sync), np.asarray(upd_global["batch_stats"]["var"]), atol=1e-4
    )
