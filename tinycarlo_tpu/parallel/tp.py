"""Tensor parallelism for the tinycar_net family.

Megatron-style column/row sharding of the MLP pairs over the `model` mesh
axis: the first Dense of each wide pair splits its output dimension
(column-parallel), the following Dense splits its input dimension
(row-parallel), so the only TP communication is the psum XLA inserts after
the row-parallel matmul. At tinycar_net sizes TP is about demonstrating
the scale-out path (SURVEY.md §2.5 TP row: "relevant at large batch;
optional"); the same rules apply unchanged to scaled-up variants.

The plan keys on the models' EXPLICIT layer names (tinycar_net.py names
its TP-relevant Dense layers after the reference's attributes: fcm2/fcm3
in the maneuver trunk, fc1/fc2 in the actor head and critics), so a
module reorder cannot silently degrade a matmul to replicated -- and
`tp_plan` lets tests assert the exact sharded set (a rename breaks the
test, not the sharding).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinycarlo_tpu.parallel.mesh import MODEL_AXIS

# Column-parallel layers (output dim sharded; bias shards with it) and
# their row-parallel consumers (input dim sharded; bias replicated, added
# once after the psum). "fc1"/"fc2" cover both the actor head (200->100)
# and the critics (512->1); "fcm2"/"fcm3" the maneuver trunk (200->F).
_COLUMN = frozenset({"fc1", "fcm2"})
_ROW = frozenset({"fc2", "fcm3"})


def _leaf_names(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)


def _spec_for(names: Tuple[str, ...]) -> P:
    """PartitionSpec for one tinycar_net param leaf by explicit names."""
    if len(names) < 2:
        return P()
    layer, leaf = names[-2], names[-1]
    if layer in _COLUMN:
        if leaf == "kernel":
            return P(None, MODEL_AXIS)
        if leaf == "bias":
            return P(MODEL_AXIS)
    if layer in _ROW and leaf == "kernel":
        return P(MODEL_AXIS, None)
    return P()


def tp_plan(params: Any) -> Dict[Tuple[str, ...], str]:
    """{param path: "column"|"row"} for every leaf the plan shards.

    Tests assert this against the exact expected set per net; an empty
    plan for a net that has TP pairs means the explicit layer names were
    lost (e.g. a rename back to auto-numbered Dense).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    plan = {}
    for path, _ in flat:
        names = _leaf_names(path)
        spec = _spec_for(names)
        if spec != P():
            kind = "column" if names[-2] in _COLUMN else "row"
            plan[names] = kind
    return plan


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a tinycar_net param tree with TP shardings over `mesh`."""

    def put(path, leaf):
        spec = _spec_for(_leaf_names(path))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
