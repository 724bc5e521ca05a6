"""Device-mesh utilities: the scale-out layer.

The reference is strictly single-process/single-device (SURVEY.md §2.5;
reference has no distributed backend at all). Here scale-out is standard
JAX SPMD: a `Mesh` with a `data` axis for environment/batch sharding (DP)
and a `model` axis for tensor-parallel layers and segment-sharded
rasterization (TP/SP). XLA inserts the collectives (psum/all-gather) over
ICI; multi-host pods extend the same mesh across processes via
`jax.distributed.initialize` + `jax.make_mesh` with no code changes here.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    `data=None` uses all remaining devices after the model axis. The model
    axis is innermost so TP collectives ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} exceeds {n} devices"
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (envs, replay batches)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree whose leaves carry a leading batch axis so that axis
    is sharded over `data` and everything else is replicated."""

    def put(x):
        x = jax.numpy.asarray(x)
        spec = P(*((DATA_AXIS,) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh (env params, configs)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
