"""On-device replay buffer: donated ring storage, random-eviction, batched
insertion.

The reference's buffers are host numpy arrays fed one transition at a time
with host->device copies on every sample (reference: examples/rl_utils.py:
13-57). Here the storage lives in device HBM as a pytree; `add_batch`
inserts whole vectorized-rollout slices and `sample` gathers training
batches without ever leaving the chip. Semantics preserved: append while
not full, then overwrite uniformly random slots (rl_utils.py:20-22), and
samples drawn uniformly over the filled prefix (rl_utils.py:26).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    """Storage is a dict pytree of (size, ...) arrays; `filled` counts the
    valid prefix. Works for flat features and temporal (size, seq, F)
    layouts alike -- the reference's Replaybuffer and ReplaybufferTemporal
    collapse into one structure.
    """

    storage: Dict[str, jnp.ndarray]
    filled: jnp.ndarray  # () int32
    size: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.size


def create(size: int, example: Dict[str, jnp.ndarray]) -> ReplayBuffer:
    """Allocate a buffer holding `size` items shaped like `example`
    (one item, no batch axis)."""
    storage = jax.tree.map(
        lambda x: jnp.zeros((size, *jnp.shape(x)), jnp.asarray(x).dtype),
        example,
    )
    return ReplayBuffer(
        storage=storage, filled=jnp.zeros((), jnp.int32), size=size
    )


def add_batch(
    buf: ReplayBuffer, key: jnp.ndarray, batch: Dict[str, jnp.ndarray]
) -> ReplayBuffer:
    """Insert a batch of items (leading axis B).

    While the buffer has room the batch appends contiguously; once full,
    each item overwrites an independent uniformly-random slot -- the
    batched generalization of the reference's per-item random eviction
    (rl_utils.py:20-22).
    """
    b = jax.tree.leaves(batch)[0].shape[0]
    append_idx = buf.filled + jnp.arange(b, dtype=jnp.int32)
    evict_idx = jax.random.randint(key, (b,), 0, buf.size)
    idx = jnp.where(append_idx < buf.size, append_idx, evict_idx)
    storage = jax.tree.map(
        lambda s, x: s.at[idx].set(x), buf.storage, batch
    )
    filled = jnp.minimum(buf.filled + b, buf.size)
    return buf.replace(storage=storage, filled=filled)


def sample(
    buf: ReplayBuffer, key: jnp.ndarray, batch_size: int
) -> Dict[str, jnp.ndarray]:
    """Uniform sample over the filled prefix (reference rl_utils.py:24-27).
    Caller ensures filled >= batch_size (same assert as the reference)."""
    idx = jax.random.randint(key, (batch_size,), 0, buf.filled)
    return jax.tree.map(lambda s: s[idx], buf.storage)


def save(buf: ReplayBuffer, filename: str) -> None:
    """Persist to an npz (reference rl_utils.py:48-49)."""
    import numpy as np

    host = jax.device_get(buf.storage)
    np.savez_compressed(
        filename, __filled=int(buf.filled), **{k: v for k, v in host.items()}
    )


def load(filename: str) -> ReplayBuffer:
    """Restore from an npz (reference rl_utils.py:51-54)."""
    import numpy as np

    data = np.load(filename)
    storage = {k: jnp.asarray(v) for k, v in data.items() if k != "__filled"}
    size = jax.tree.leaves(storage)[0].shape[0]
    return ReplayBuffer(
        storage=storage,
        filled=jnp.asarray(int(data["__filled"]), jnp.int32),
        size=size,
    )
