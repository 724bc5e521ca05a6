"""Tensor parallelism for the tinycar_net family.

Megatron-style column/row sharding of the MLP pairs over the `model` mesh
axis: the first Dense of each wide pair splits its output dimension
(column-parallel), the following Dense splits its input dimension
(row-parallel), so the only TP communication is the psum XLA inserts after
the row-parallel matmul. At tinycar_net sizes TP is about demonstrating
the scale-out path (SURVEY.md §2.5 TP row: "relevant at large batch;
optional"); the same rules apply unchanged to scaled-up variants.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinycarlo_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one tinycar_net param leaf.

    Column-parallel (out-dim sharded): critic fc1 (512) and the actor
    trunk's widest Dense; row-parallel (in-dim sharded): the layer
    consuming those activations. Biases of column-parallel layers shard on
    the same axis; everything else replicates.
    """
    names = [p for p in path]
    is_kernel = names[-1] == "kernel"
    is_bias = names[-1] == "bias"
    joined = "/".join(names)

    # critic: fc1 (Dense_2 512-wide after the 3 embed layers) column,
    # output head Dense_3 row.
    if "Dense_2" in names and ("Critic" in joined or len(names) == 2):
        if is_kernel:
            return P(None, MODEL_AXIS)
        if is_bias:
            return P(MODEL_AXIS)
    if "Dense_3" in names and is_kernel:
        return P(MODEL_AXIS, None)

    # actor trunk: fcm2 (200) column, fcm3 row.
    if "_ManeuverTrunk_0" in names:
        if "Dense_1" in names:
            if is_kernel:
                return P(None, MODEL_AXIS)
            if is_bias:
                return P(MODEL_AXIS)
        if "Dense_2" in names and is_kernel:
            return P(MODEL_AXIS, None)
    # actor head: fc1 (200) column, fc2 row.
    if "_ActorHead_0" in names:
        if "Dense_0" in names:
            if is_kernel:
                return P(None, MODEL_AXIS)
            if is_bias:
                return P(MODEL_AXIS)
        if "Dense_1" in names and is_kernel:
            return P(MODEL_AXIS, None)
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a tinycar_net param tree with TP shardings over `mesh`."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def put(path, leaf):
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        spec = _spec_for(names, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: put(path, leaf), params
    )
