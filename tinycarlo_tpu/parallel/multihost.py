"""Multi-host pod-slice support.

The single-host code in this package (mesh.py/tp.py/sp.py) extends to a
multi-host TPU pod unchanged: after `initialize()`, `jax.devices()` spans
every host's chips, `make_mesh` lays the global mesh over them, and the
jitted env/training programs are SPMD -- each host feeds its addressable
shard of the env batch while XLA runs collectives over ICI within a slice
and DCN across slices. This is the TPU-native replacement for the
distributed backends the reference entirely lacks (SURVEY.md §2.5).

Failure model (SURVEY.md §5): no elasticity is owed -- a failed host
aborts the job, which restarts from the latest Orbax checkpoint
(`tinycarlo_tpu.utils.checkpoint` handles sharded state).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper; on TPU pods arguments are
    auto-detected from the environment (no-op on a single host).

    Must run before any JAX backend initializes -- in particular, do NOT
    probe `jax.process_count()` here: that call itself initializes the
    local backend and would turn the subsequent distributed initialize
    into a silent no-op (the round-1 bug tests/test_multihost.py now
    guards against).
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            raise
        # single-process run without cluster env vars: stay local


def local_batch_slice(n_global_envs: int) -> slice:
    """The [start, stop) rows of the global env batch this host owns when
    the batch axis is sharded over all devices in process order."""
    per = n_global_envs // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def global_array(value, mesh, spec):
    """Full-content host value (identical on every process) -> global
    jax.Array with NamedSharding(mesh, spec).

    The multi-host placement path for REPLICATED or tensor-sharded state
    (replay buffer, learner params under the TP plan): every process
    holds the full value and `jax.make_array_from_callback` hands each
    addressable device its shard. Per-host-sharded batches should use
    `host_local_array` instead (each host produces only its rows)."""
    from jax.sharding import NamedSharding

    arr = np.asarray(value)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def host_local_array(global_shape, mesh, make_local):
    """Assemble a globally-sharded array from per-host local data.

    `make_local(local_slice) -> np.ndarray` produces this host's rows.
    Uses `jax.make_array_from_process_local_data`, the standard multi-host
    feeding path.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(
        mesh, P(mesh.axis_names[0], *([None] * (len(global_shape) - 1)))
    )
    local = make_local(local_batch_slice(global_shape[0]))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local), global_shape
    )
