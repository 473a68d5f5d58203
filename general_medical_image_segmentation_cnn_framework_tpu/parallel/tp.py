"""Megatron-style tensor parallelism for the transformer families.

The reference has no model parallelism at all (its distributed story is
HF Accelerate DDP, /root/reference/train.py:167-169); this is a
capability extension in the SURVEY §2.6 space. Sharding is expressed
purely as ``NamedSharding`` rules over a ``model`` mesh axis — no module
rewrites, no manual collectives: GSPMD inserts the two all-reduces per
transformer block (after the attention out-projection and after MLP
fc2), which is exactly the Megatron-LM decomposition:

* **column-parallel** (output dim sharded, bias sharded alike): the
  q/k/v projections (UNETR ``_SelfAttention/Dense_{0,1,2}``), the fused
  qkv (VT-UNet ``WindowAttention3D/Dense_0``), and MLP fc1 — each chip
  computes a slice of heads / hidden units with NO communication.
* **row-parallel** (input dim sharded, bias replicated): the attention
  out-projection and MLP fc2 — each chip contracts its slice; XLA
  all-reduces the partial sums before the (replicated) bias add.

Everything else — convs, norms, embeddings, the relative-position bias
tables — stays replicated. Semantics are GSPMD-exact for ANY mesh size
(propagation may fall back to resharding when a dim doesn't divide);
for communication-optimal execution pick a model-axis size that divides
``num_heads`` (and d_ff). Because the rules match on path SUFFIXES,
the same function shards optimizer states (whose ``mu``/``nu`` subtrees
mirror the param paths) consistently with their parameters.

Composes with data parallelism over a 2-D mesh (``mesh_shape=
"data=2,model=4"``): batches shard over ``data``, these weights over
``model``. CLI: ``config.param_sharding=tp``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix regex, spec) — first match wins; no match = replicated.
# Paths are "/".join of pytree keys, e.g.
#   params/_TransformerBlock_3/_SelfAttention_0/Dense_2/kernel
_UNETR_RULES: List[Tuple[str, P]] = [
    # attention q/k/v: column-parallel over heads
    (r"(^|/)_SelfAttention_\d+/Dense_[012]/kernel$", P(None, "model")),
    (r"(^|/)_SelfAttention_\d+/Dense_[012]/bias$", P("model")),
    # attention out-projection: row-parallel (all-reduce after)
    (r"(^|/)_SelfAttention_\d+/Dense_3/kernel$", P("model", None)),
    (r"(^|/)_SelfAttention_\d+/Dense_3/bias$", P()),
    # MLP fc1 (d_ff=2048): column-parallel
    (r"(^|/)_TransformerBlock_\d+/Dense_0/kernel$", P(None, "model")),
    (r"(^|/)_TransformerBlock_\d+/Dense_0/bias$", P("model")),
    # MLP fc2: row-parallel
    (r"(^|/)_TransformerBlock_\d+/Dense_1/kernel$", P("model", None)),
    (r"(^|/)_TransformerBlock_\d+/Dense_1/bias$", P()),
]

_VT_RULES: List[Tuple[str, P]] = [
    # fused qkv (dim -> 3*dim): column-parallel. NOTE the downstream
    # reshape to (3, heads, head_dim) interleaves q/k/v along the sharded
    # flat dim; GSPMD keeps it exact but may reshard — the MLP rules
    # below carry the clean Megatron win.
    (r"(^|/)WindowAttention3D_\d+/Dense_0/kernel$", P(None, "model")),
    (r"(^|/)WindowAttention3D_\d+/Dense_0/bias$", P("model")),
    # attention out-projection: row-parallel
    (r"(^|/)WindowAttention3D_\d+/Dense_1/kernel$", P("model", None)),
    (r"(^|/)WindowAttention3D_\d+/Dense_1/bias$", P()),
    # Swin MLP: column then row
    (r"(^|/)Mlp_\d+/Dense_0/kernel$", P(None, "model")),
    (r"(^|/)Mlp_\d+/Dense_0/bias$", P("model")),
    (r"(^|/)Mlp_\d+/Dense_1/kernel$", P("model", None)),
    (r"(^|/)Mlp_\d+/Dense_1/bias$", P()),
]

RULES = {
    "unetr": _UNETR_RULES,
    "vtnet": _VT_RULES,
    "vt_unet": _VT_RULES,
}


def supports_tp(network: str) -> bool:
    return network in RULES


def _path_str(key_path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)


def tp_shardings(tree, mesh: Mesh, network: str, axis: str = "model"):
    """A pytree of NamedShardings mirroring `tree`: transformer weights
    sharded per the network's Megatron rules, everything else replicated.

    Works on params AND optimizer-state trees (suffix matching reaches
    the mu/nu mirrors inside optax states); leaves whose shape doesn't
    divide the axis fall back to replicated (never an invalid sharding).
    """
    rules = RULES[network]
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def spec_of(path: str, leaf) -> P:
        shape = tuple(getattr(leaf, "shape", ()))
        for pat, spec in rules:
            if re.search(pat, path):
                if axis != "model":
                    spec = P(*[axis if s == "model" else s for s in spec])
                # divisibility guard: replicate rather than crash
                for d, s in enumerate(spec):
                    if s is not None and (
                        d >= len(shape) or shape[d] % axis_size
                    ):
                        return P()
                return spec
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = [
        NamedSharding(mesh, spec_of(_path_str(kp), leaf)) for kp, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params_tp(tree, mesh: Mesh, network: str, axis: str = "model"):
    """device_put `tree` with tp_shardings."""
    return jax.device_put(tree, tp_shardings(tree, mesh, network, axis))
