"""Checkpoint / resume via Orbax.

The reference checkpoints ad-hoc: torch.save for weights
(reference: examples/train_td3.py:214, train_stanley_il.py:137) and
np.savez for buffers/datasets (rl_utils.py:48-54), with no env-state
checkpointing. Here any pytree checkpoints uniformly -- learner states,
replay buffers, and (a capability the reference lacks) the full batched
env state, so long training runs resume mid-episode after preemption.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save(path: str, tree: Any, force: bool = True) -> None:
    """Write a pytree checkpoint to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore(path: str, example: Optional[Any] = None) -> Any:
    """Restore a checkpoint. With `example` (a pytree of like-shaped
    arrays, e.g. a freshly-initialized state), leaves come back with the
    example's shardings/dtypes; without it, as host arrays."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if example is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, example)
            restored = ckptr.restore(path, target)
            # preserve the example's shardings
            return jax.tree.map(
                lambda e, r: jax.device_put(r, e.sharding)
                if hasattr(e, "sharding")
                else r,
                example,
                restored,
            )
        return ckptr.restore(path)
