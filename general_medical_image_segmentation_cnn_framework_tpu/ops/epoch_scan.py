"""Whole-epoch training as ONE XLA program (lax.scan over steps).

With the device data backend every volume already lives in HBM, so an
entire epoch — patch gather, forward, loss, backward, Adam update, metric
— can run as a single ``lax.scan`` over steps: zero host round trips
between steps. On dispatch-latency-bound transports this removes the
per-step overhead entirely; on healthy links it still removes the
host-side loop bookkeeping.

Heterogeneous volume shapes are supported: volumes are zero-padded to the
per-dataset max extent for the stacked [V, X, Y, Z, C] HBM array, while
patch origins are sampled from each volume's TRUE extent (identical
sampler semantics to the queue path — a patch never reads padding).
``config.aug=true`` folds the on-device augmentation pipeline into the
same program (uniform-shape datasets only). Enabled with
``config.epoch_scan=true`` (+ ``data_backend=device``); per-step
loss/dice come back as arrays and are logged after the epoch.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build_epoch_plan(
    n_volumes: int,
    samples_per_volume: int,
    batch_size: int,
    spatial_shape,
    patch_size,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """(vol_idx [steps, bs], origins [steps, bs, 3]) for one epoch,
    mirroring the queue sampler: shuffled volume order, samples_per_volume
    uniform patches each, drop_last.

    ``spatial_shape`` is either one [3] shape shared by all volumes or a
    [n_volumes, 3] array of per-volume TRUE extents — origins are sampled
    within each sampled volume's own extent, so heterogeneous datasets
    keep exact uniform-sampler semantics even though storage is padded.
    """
    vol_order = np.repeat(rng.permutation(n_volumes), samples_per_volume)
    n_steps = len(vol_order) // batch_size
    vol_order = vol_order[: n_steps * batch_size]
    shapes = np.asarray(spatial_shape, dtype=np.int64)
    if shapes.ndim == 1:
        shapes = np.broadcast_to(shapes, (n_volumes, 3))
    maxs = shapes - np.asarray(patch_size, dtype=np.int64)  # [V, 3]
    if (maxs < 0).any():
        bad = int(np.argmin(maxs.min(axis=1)))
        raise ValueError(
            f"volume {bad} spatial {tuple(shapes[bad])} smaller than patch "
            f"{tuple(patch_size)}"
        )
    per = maxs[vol_order]  # [N, 3] inclusive upper bounds
    # rng.integers broadcasts over the per-volume bounds and is exact
    # (floor(random()*(n)) can round up to n when n is a power of two)
    origins = rng.integers(per + 1)
    return (
        vol_order.reshape(n_steps, batch_size).astype(np.int32),
        origins.reshape(n_steps, batch_size, 3).astype(np.int32),
    )


def make_epoch_scan(
    config, model, tx, forward: Callable, loss_and_metric: Callable,
    spatial_mesh=None,
):
    """Returns jitted ``epoch_fn(params, batch_stats, opt_state, volumes,
    labels, vol_idx, origins, rng) -> (params, stats, opt, losses, dices)``.

    ``forward(variables, x, train, rngs, mutable)`` is the driver's
    network adapter; ``loss_and_metric(pred, gt) -> (loss, dice)``.

    With ``config.aug=true`` the stored volumes are RAW and every epoch
    re-augments each one on device (data/device_aug.py) before the step
    scan — the whole augmented epoch remains ONE XLA program. Requires
    uniform volume shapes (augmenting zero-padded storage would skew the
    znorm statistics; train.py enforces this).

    ``spatial_mesh``: shard every gathered patch's first SPATIAL axis over
    that mesh's ``data`` axis (config.spatial_sharding) — the scale-out
    story for bs=1 whole-patch/whole-volume epochs where there is no batch
    dim to shard; GSPMD inserts the conv halo exchanges. Mutually
    exclusive with shard_epoch_plan's batch sharding.
    """
    patch_size = tuple(config.patch_size)
    aug = bool(getattr(config, "aug", False))
    if spatial_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        patch_sharding = NamedSharding(
            spatial_mesh, P(None, "data", None, None, None)
        )
    else:
        patch_sharding = None

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_fn(params, batch_stats, opt_state, volumes, labels, vol_idx, origins, rng):
        if aug:
            from ..data.device_aug import augment_pair

            rng, aug_rng = jax.random.split(rng)

            def aug_one(pair_and_key):
                src, gt, key = pair_and_key
                s_cf, g_cf = augment_pair(
                    key, jnp.moveaxis(src, -1, 0), jnp.moveaxis(gt, -1, 0)
                )
                return jnp.moveaxis(s_cf, 0, -1), jnp.moveaxis(g_cf, 0, -1)

            keys = jax.random.split(aug_rng, volumes.shape[0])
            # lax.map (not vmap): keeps the OneOf's lax.cond a real branch
            # per volume instead of computing affine AND elastic for all
            volumes, labels = jax.lax.map(aug_one, (volumes, labels, keys))

        def gather(store, idx, origin):
            vol = store[idx]
            return jax.lax.dynamic_slice(
                vol, (origin[0], origin[1], origin[2], 0),
                patch_size + (vol.shape[-1],),
            )

        def step(carry, inputs):
            params, batch_stats, opt_state, rng = carry
            idxs, origs = inputs
            x = jax.vmap(partial(gather, volumes))(idxs, origs)
            y = jax.vmap(partial(gather, labels))(idxs, origs)
            if patch_sharding is not None:
                x = jax.lax.with_sharding_constraint(x, patch_sharding)
                y = jax.lax.with_sharding_constraint(y, patch_sharding)
            rng, step_rng = jax.random.split(rng)

            def loss_fn(p):
                variables = {"params": p, "batch_stats": batch_stats}
                pred, updates = forward(
                    variables, x, True, {"dropout": step_rng}, ["batch_stats"]
                )
                loss, dice = loss_and_metric(pred, y)
                return loss, (dice, updates.get("batch_stats", batch_stats))

            (loss, (dice, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state, rng), (loss, dice)

        (params, batch_stats, opt_state, _), (losses, dices) = jax.lax.scan(
            step, (params, batch_stats, opt_state, rng), (vol_idx, origins)
        )
        return params, batch_stats, opt_state, losses, dices

    return epoch_fn


def place_epoch_store(mesh, volumes, labels):
    """Replicate the stacked volume/label stores over the mesh: every
    device gathers its own batch shard from a full local copy (the store
    is read-only and any step may sample any volume)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.device_put(volumes, rep), jax.device_put(labels, rep)


def shard_epoch_plan(mesh, vol_idx, origins):
    """Data-parallel epoch_scan: shard the plan's per-step batch dim over
    the mesh's ``data`` axis. Each device gathers and trains on its share
    of every step's patches; GSPMD inserts the gradient / batch-global-BN
    all-reduces, so the whole DP epoch is still ONE XLA program (the
    reference's Accelerate-DDP loop re-dispatches per step,
    /root/reference/train.py:167-214)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    vol_idx = jax.device_put(
        jnp.asarray(vol_idx), NamedSharding(mesh, P(None, "data"))
    )
    origins = jax.device_put(
        jnp.asarray(origins), NamedSharding(mesh, P(None, "data", None))
    )
    return vol_idx, origins
