"""Checkpointing with the reference's semantics, msgpack on disk.

The reference torch.saves ``{model, optim, scheduler, epoch}`` to
``latest_checkpoint.pt`` every epoch plus ``checkpoint_%04d.pt`` every
``epochs_per_checkpoint`` (/root/reference/train.py:284-306), resumes all
four when ``load_mode==1`` (train.py:123-140), and predict consumes only
the model weights (predict.py:79-81).

Here: one msgpack file holds ``{params, batch_stats, opt_state, epoch}``
(the LR schedule is a pure function of the step, so no scheduler state is
needed — optax schedules recompute from ``epoch``). An orbax backend
(``config.checkpoint_backend=orbax``) writes the same state as an orbax
StandardCheckpointer directory instead — the idiomatic choice for
multi-host/sharded state.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
from flax import serialization

from .utils.transfer import chunked_device_get


def save_checkpoint(
    path: Union[str, Path],
    params: Any,
    batch_stats: Any,
    opt_state: Any,
    epoch: int,
) -> None:
    state = {
        "params": chunked_device_get(params),
        "batch_stats": chunked_device_get(batch_stats),
        # to_state_dict: optax states are NamedTuples/tuples, which msgpack
        # can't pack directly; the skeleton is rebuilt on load via template
        "opt_state": serialization.to_state_dict(chunked_device_get(opt_state)),
        "epoch": epoch,
    }
    blob = serialization.msgpack_serialize(state)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: Union[str, Path], template: Optional[Dict] = None) -> Dict:
    """Load a checkpoint; with ``template``, restore exact pytree structure
    (msgpack stores dicts/arrays — opt_state needs its NamedTuple skeleton)."""
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if template is not None:
        restored = {}
        for key, tmpl in template.items():
            if key == "epoch":
                restored[key] = int(state["epoch"])
            else:
                restored[key] = serialization.from_state_dict(tmpl, state[key])
        return restored
    return state


def save_checkpoint_orbax(path, params, batch_stats, opt_state, epoch: int) -> None:
    """Orbax StandardCheckpointer backend (directory-format checkpoint)."""
    import orbax.checkpoint as ocp

    state = {
        "params": chunked_device_get(params),
        "batch_stats": chunked_device_get(batch_stats),
        "opt_state": serialization.to_state_dict(chunked_device_get(opt_state)),
        "epoch": epoch,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), state, force=True)


def load_checkpoint_orbax(path, template: Optional[Dict] = None) -> Dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(Path(path).resolve())
    if template is not None:
        restored = {}
        for key, tmpl in template.items():
            if key == "epoch":
                restored[key] = int(state["epoch"])
            else:
                restored[key] = serialization.from_state_dict(tmpl, state[key])
        return restored
    return state


def load_any_checkpoint(path, template: Optional[Dict] = None) -> Dict:
    """Dispatch on checkpoint format: orbax directory vs msgpack file."""
    if Path(path).is_dir():
        return load_checkpoint_orbax(path, template)
    return load_checkpoint(path, template)


def save_epoch_checkpoints(config, run_dir: Union[str, Path], epoch: int, **state) -> None:
    """latest every epoch + periodic checkpoint_%04d (train.py:284-306)."""
    run_dir = Path(run_dir)
    if getattr(config, "checkpoint_backend", "msgpack") == "orbax":
        save_checkpoint_orbax(run_dir / config.latest_checkpoint_file, epoch=epoch, **state)
        if epoch % config.epochs_per_checkpoint == 0:
            save_checkpoint_orbax(run_dir / f"checkpoint_{epoch:04d}.ckpt", epoch=epoch, **state)
        return
    save_checkpoint(run_dir / config.latest_checkpoint_file, epoch=epoch, **state)
    if epoch % config.epochs_per_checkpoint == 0:
        save_checkpoint(run_dir / f"checkpoint_{epoch:04d}.ckpt", epoch=epoch, **state)


@jax.jit
def _device_snapshot(tree):
    """Fresh device buffers so donation of the originals can't race the
    background writer."""
    return jax.tree_util.tree_map(lambda a: a + jnp.zeros((), a.dtype), tree)


class AsyncCheckpointer:
    """Overlapped checkpointing: snapshot on device (cheap), fetch+write in
    a background thread. The reference blocks the train loop on torch.save
    every epoch (train.py:284-306); here the loop continues while the
    previous epoch's weights stream out.

    When the writer is slower than an epoch, non-periodic "latest" saves
    are coalesced: the newest state replaces the queued one, so the loop
    never blocks and the freshest weights win. Periodic ``checkpoint_%04d``
    saves are never dropped (they wait their turn), and ``wait()`` flushes
    the last coalesced state, so the final epoch is always on disk.
    """

    def __init__(self) -> None:
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._pending = None
        self._deferred = None  # newest coalesced (config, run_dir, epoch, snap)

    def save_epoch(self, config, run_dir, epoch: int, params, batch_stats, opt_state) -> None:
        snap = _device_snapshot({"p": params, "b": batch_stats, "o": opt_state})
        periodic = epoch % config.epochs_per_checkpoint == 0
        if self._pending is not None and not self._pending.done() and not periodic:
            self._deferred = (config, run_dir, epoch, snap)
            return
        self.wait()
        self._deferred = None
        self._pending = self._pool.submit(
            self._write, config, run_dir, epoch, snap
        )

    @staticmethod
    def _write(config, run_dir, epoch, snap) -> None:
        save_epoch_checkpoints(
            config, run_dir, epoch,
            params=snap["p"], batch_stats=snap["b"], opt_state=snap["o"],
        )

    def wait(self) -> None:
        if self._pending is not None:
            self._pending.result()
            self._pending = None
        if self._deferred is not None:
            args = self._deferred
            self._deferred = None
            self._write(*args)
