"""Composable pure reward/termination/observation shaping.

TPU-native re-design of the reference's gymnasium `Wrapper` subclasses
(reference: tinycarlo/wrapper/reward.py, termination.py, observation.py,
utils.py). Where the reference wraps `step()` with Python objects holding
mutable counters, shaping here is a pair of pure functions over pytrees:

    reward = shaper(info, params)                       (stateless)
    terminated, counters' = terminator(info, counters)  (stateful)

so the whole stack fuses into the jitted env step and vmaps over thousands
of environments. `WrapperStack` bundles an arbitrary composition and is
consumed by `tinycarlo_tpu.vector.VecEnv`; the Gymnasium drop-in classes in
`tinycarlo_tpu.wrapper.reward/termination/observation` are thin host-side
shims over these same functions.

Layer-name-keyed dicts in the reference (e.g. per-laneline sparse rewards,
reference wrapper/reward.py:22) become static per-layer coefficient vectors
aligned with `MapData.laneline_names`.
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct


def linear_reward(x, max_x, max_reward=1.0, min_reward=0.0):
    """Linear ramp: max_reward at |x|=0, zero at |x|=max_x, clamped.

    Mirrors reference wrapper/utils.py:21-36 including the sign-dependent
    clamp direction (negative max_reward clamps from above).
    """
    y = (-max_reward / max_x) * jnp.abs(x) + max_reward
    if max_reward > 0:
        return jnp.maximum(y, min_reward)
    return jnp.minimum(y, min_reward)


def _coeffs(
    values: Dict[str, float], layer_names: Sequence[str], default: float = 0.0
) -> jnp.ndarray:
    return jnp.asarray([values.get(n, default) for n in layer_names])


# ---------------------------------------------------------------------------
# Reward shapers: (info, ...) -> reward contribution. All *add* to the
# incoming reward, exactly like the reference wrappers do.
# ---------------------------------------------------------------------------

def laneline_sparse_reward(
    info: Dict[str, jnp.ndarray],
    track_width: float,
    rewards: Dict[str, float],
    layer_names: Sequence[str],
) -> jnp.ndarray:
    """Sparse reward when a laneline is touched/crossed (distance <
    track_width/2). Reference: wrapper/reward.py:5-23."""
    c = _coeffs(rewards, layer_names)
    hit = info["laneline_distances"] < track_width / 2
    return jnp.sum(jnp.where(hit, c, 0.0), axis=-1)


def laneline_linear_reward(
    info: Dict[str, jnp.ndarray],
    track_width: float,
    max_rewards: Dict[str, float],
    layer_names: Sequence[str],
) -> jnp.ndarray:
    """Linear-in-distance laneline reward, zero at track_width.
    Reference: wrapper/reward.py:25-42 (requires a value for every layer)."""
    total = jnp.zeros(info["laneline_distances"].shape[:-1])
    for i, name in enumerate(layer_names):
        total = total + linear_reward(
            info["laneline_distances"][..., i], track_width, max_rewards[name]
        )
    return total


def cte_sparse_reward(
    info: Dict[str, jnp.ndarray], min_cte: float, sparse: float = 1.0
) -> jnp.ndarray:
    """Reward `sparse` while |cte| <= min_cte. Reference: wrapper/reward.py:44-62."""
    return jnp.where(jnp.abs(info["cte"]) <= min_cte, sparse, 0.0)


def cte_linear_reward(
    info: Dict[str, jnp.ndarray],
    min_cte: float,
    max_reward: float = 1.0,
    min_reward: float = 0.0,
) -> jnp.ndarray:
    """Linear CTE reward ramp. Reference: wrapper/reward.py:64-84."""
    return linear_reward(info["cte"], min_cte, max_reward, min_reward)


# ---------------------------------------------------------------------------
# Terminators: (info, counter) -> (terminated, counter'). Counters are int32
# arrays so they vmap; semantics (consecutive-step counting, reset-on-fire)
# mirror the reference's mutable `steps_true` fields.
# ---------------------------------------------------------------------------

def laneline_crossing_termination(
    info: Dict[str, jnp.ndarray],
    track_width: float,
    lanelines: Sequence[str],
    layer_names: Sequence[str],
) -> jnp.ndarray:
    """Terminate when any named laneline distance <= track_width/2.
    Reference: wrapper/termination.py:4-22."""
    sel = jnp.asarray([1.0 if n in lanelines else 0.0 for n in layer_names])
    hit = (info["laneline_distances"] <= track_width / 2) & (sel > 0)
    return jnp.any(hit, axis=-1)


def count_consecutive(
    condition: jnp.ndarray, counter: jnp.ndarray, number_of_steps: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared consecutive-step trigger: the counter increments while
    `condition` holds, fires at `number_of_steps`, and resets on fire or on
    any non-condition step (reference wrapper/termination.py:39-48,63-70)."""
    counter = jnp.where(condition, counter + 1, 0)
    fired = counter >= number_of_steps
    return fired, jnp.where(fired, 0, counter)


def cte_termination(
    info: Dict[str, jnp.ndarray],
    counter: jnp.ndarray,
    max_cte: float,
    number_of_steps: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Terminate after N consecutive steps with |cte| > max_cte.
    Reference: wrapper/termination.py:24-48."""
    return count_consecutive(
        jnp.abs(info["cte"]) > max_cte, counter, number_of_steps
    )


def crash_termination(
    info: Dict[str, jnp.ndarray],
    counter: jnp.ndarray,
    velocity_threshold: float = 0.005,
    number_of_steps: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Terminate after N consecutive steps with |velocity| below threshold
    (stall/crash detection). Reference: wrapper/termination.py:50-70."""
    return count_consecutive(
        jnp.abs(info["velocity"]) < velocity_threshold, counter, number_of_steps
    )


# ---------------------------------------------------------------------------
# Observation noise (domain randomization).
# ---------------------------------------------------------------------------

def add_blob_noise_classes(
    key: jnp.ndarray,
    observation: jnp.ndarray,  # (C, H, W) uint8
    blob_max_radius: int = 100,
    n_blobs: int = 10,
) -> jnp.ndarray:
    """Per-channel random disc noise on class masks.

    Mirrors reference NoiseObservationWrapper.add_blob_noise_classes
    (wrapper/observation.py:15-27): per channel, n_blobs random discs; with
    p=0.3 OR-in the disc's content copied from a random channel, else erase
    the disc. The reference applies blobs sequentially per channel (earlier
    blobs feed later copies); here each channel's blobs are computed against
    the *input* frame and composed in one shot -- same noise distribution,
    fully batched, no serial loop.
    """
    c, h, w = observation.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    shape = (c, n_blobs)
    xs = jax.random.randint(k1, shape, 0, w)
    ys = jax.random.randint(k2, shape, 0, h)
    radius = jax.random.randint(k3, shape, 1, max(2, blob_max_radius))
    copy_mode = jax.random.uniform(k4, shape) < 0.3
    src_channel = jax.random.randint(k5, shape, 0, c)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def one_channel(ch_xs, ch_ys, ch_r, ch_copy, ch_src, frame_ch):
        def disc(x0, y0, r):
            return (xx - x0) ** 2 + (yy - y0) ** 2 <= r * r

        discs = jax.vmap(disc)(ch_xs, ch_ys, ch_r)  # (n_blobs, H, W)
        src = observation[ch_src]  # (n_blobs, H, W)
        add = jnp.any(discs & ch_copy[:, None, None] & (src > 0), axis=0)
        erase = jnp.any(discs & ~ch_copy[:, None, None], axis=0)
        out = jnp.where(add, jnp.uint8(255), frame_ch)
        return jnp.where(erase, jnp.uint8(0), out)

    return jax.vmap(one_channel)(
        xs, ys, radius, copy_mode, src_channel, observation
    )


# ---------------------------------------------------------------------------
# Composition: a stack of shapers/terminators as one pure transform,
# the in-graph equivalent of nesting gymnasium wrappers.
# ---------------------------------------------------------------------------

RewardFn = Callable[[Dict[str, jnp.ndarray]], jnp.ndarray]
TerminationFn = Callable[
    [Dict[str, jnp.ndarray], jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]
]


@struct.dataclass
class WrapperStack:
    """A fused wrapper stack: sum of reward shapers, OR of terminators.

    `reward_fns` / `termination_fns` are static (they select the compiled
    program); `init_counters()` builds the per-env counter pytree carried
    through scan/vmap. When a stack carries reward or termination fns the
    env's default shaping is disabled, mirroring `unwrapped.wrapped =
    True` (reference wrapper/reward.py:16, env.py:136-138). One deliberate
    deviation: an observation-only stack keeps the default reward (the
    reference's NoiseObservationWrapper silently zeroes rewards by setting
    the flag, which is a trap rather than a behavior worth keeping; the
    Gymnasium class wrapper retains exact reference semantics).
    """

    reward_fns: Tuple[RewardFn, ...] = struct.field(
        pytree_node=False, default=()
    )
    termination_fns: Tuple[TerminationFn, ...] = struct.field(
        pytree_node=False, default=()
    )
    # per-env observation transforms `(key, obs) -> obs` (e.g.
    # add_blob_noise_classes), the in-graph NoiseObservationWrapper
    observation_fns: Tuple[Callable, ...] = struct.field(
        pytree_node=False, default=()
    )

    def apply_observation(self, key: jnp.ndarray, obs: jnp.ndarray):
        for i, fn in enumerate(self.observation_fns):
            obs = fn(jax.random.fold_in(key, i), obs)
        return obs

    def init_counters(self) -> Tuple[jnp.ndarray, ...]:
        return tuple(jnp.zeros((), jnp.int32) for _ in self.termination_fns)

    def apply(
        self,
        info: Dict[str, jnp.ndarray],
        reward: jnp.ndarray,
        terminated: jnp.ndarray,
        counters: Tuple[jnp.ndarray, ...],
    ):
        for fn in self.reward_fns:
            reward = reward + fn(info)
        new_counters = []
        for fn, counter in zip(self.termination_fns, counters):
            fired, counter = fn(info, counter)
            terminated = terminated | fired
            new_counters.append(counter)
        return reward, terminated, tuple(new_counters)
