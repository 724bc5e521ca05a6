"""Batched auto-resetting environment: the framework's primary citizen.

The reference steps ONE env per Python call (reference: tinycarlo/env.py);
here a rollout is `jit(vmap(step))` over an `EnvState` whose leaves carry a
leading batch axis, with in-graph auto-reset (`jnp.where` respawn on
terminated|truncated) and the wrapper stack fused into the same XLA
program. Sharding the batch axis over a device mesh turns this into a
pod-scale simulator -- see `tinycarlo_tpu.parallel`.

Auto-reset follows the gymnax/brax convention: when an env finishes, the
returned `obs`/`state` already belong to the NEXT episode, while `reward`,
`terminated`, `truncated`, and `info` describe the finishing step. The
single-env Gymnasium shim (`tinycarlo_tpu.gym_env`) keeps the reference's
caller-driven reset semantics for parity.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.utils.helper import getenv
from tinycarlo_tpu.wrapper.functional import WrapperStack


@struct.dataclass
class VecState:
    """Batched env state: every leaf has leading axis B."""

    env: fenv.EnvState
    counters: Tuple[jnp.ndarray, ...]  # wrapper terminator counters, (B,) each
    episode_step: jnp.ndarray  # (B,) int32


def _single_reset(params, key):
    state, _, _ = fenv.reset(params, key, render=False)
    return state


def reset(
    params: fenv.EnvParams,
    key: jnp.ndarray,
    n_envs: int,
    stack: Optional[WrapperStack] = None,
    render: bool = True,
) -> Tuple[VecState, jnp.ndarray]:
    """Spawn n_envs environments from split keys. Returns (state, obs(B,...))."""
    stack = stack or WrapperStack()
    keys = jax.random.split(key, n_envs)
    env_state = jax.vmap(partial(_single_reset, params))(keys)
    counters = tuple(
        jnp.zeros((n_envs,), jnp.int32) for _ in stack.termination_fns
    )
    state = VecState(
        env=env_state,
        counters=counters,
        episode_step=jnp.zeros((n_envs,), jnp.int32),
    )
    if getenv("DEBUG"):
        # segment-budget guard (reference draws unbounded lists and can
        # never drop, renderer.py:41-43; our fixed max_visible_segments
        # can): report dropped rasterizer slots at the spawn states.
        overflow = jnp.sum(fenv.check_segment_overflow(params, env_state))
        jax.debug.print(
            "tinycarlo_tpu: segment overflow at reset = {} dropped slot "
            "copies across the batch (0 = max_visible_segments budget "
            "fits; raise CameraConfig.max_visible_segments if nonzero)",
            overflow,
        )
    obs = (
        fenv.render_observation_batch(params, env_state)
        if render
        else jnp.zeros(
            (n_envs, *fenv.observation_shape(params)), jnp.uint8
        )
    )
    return state, obs


def step(
    params: fenv.EnvParams,
    state: VecState,
    action: Dict[str, jnp.ndarray],  # car_control (B,2), maneuver (B,)
    stack: Optional[WrapperStack] = None,
    max_episode_steps: Optional[int] = None,
    render: bool = True,
    auto_reset: bool = True,
):
    """Vectorized step + fused shaping + in-graph auto-reset.

    Returns (state', obs, reward, terminated, truncated, info); all leaves
    carry the leading batch axis. With a `stack`, default shaping is off
    (the in-graph analogue of `unwrapped.wrapped = True`, reference
    env.py:136-138) and the stack supplies reward/termination.
    """
    wrapped = stack is not None and (
        len(stack.reward_fns) > 0 or len(stack.termination_fns) > 0
    )
    stack = stack or WrapperStack()

    def one(env_state, counters, a, uturn_hint):
        env_state, _, reward, terminated, truncated, info = fenv.step(
            params, env_state, a, render=False, wrapped=wrapped,
            uturn_hint=uturn_hint,
        )
        reward, terminated, counters = stack.apply(
            info, reward, terminated, counters
        )
        return env_state, counters, reward, terminated, truncated, info

    # Batch-level u-turn gate: the O(E) re-snap scan inside car_step runs
    # only on steps where some env switches into maneuver 2. Passed
    # unbatched (in_axes=None) so the lax.cond stays a real conditional
    # under vmap.
    man = jnp.asarray(action["maneuver"], jnp.int32)
    any_uturn_entry = jnp.any((man == 2) & (state.env.car.last_maneuver != 2))
    env_state, counters, reward, terminated, truncated, info = jax.vmap(
        one, in_axes=(0, 0, 0, None)
    )(state.env, state.counters, action, any_uturn_entry)

    episode_step = state.episode_step + 1
    if max_episode_steps is not None:
        truncated = truncated | (episode_step >= max_episode_steps)

    done = terminated | truncated
    if auto_reset:
        # Respawn finished envs; fresh keys keep the streams independent.
        keys = jax.vmap(jax.random.split, out_axes=1)(env_state.key)
        fresh = jax.vmap(partial(_single_reset, params))(keys[1])
        env_state = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape(done.shape + (1,) * (old.ndim - 1)), new, old
            ),
            fresh,
            env_state.replace(key=keys[0]),
        )
        counters = tuple(jnp.where(done, 0, c) for c in counters)
        episode_step = jnp.where(done, 0, episode_step)

    state = VecState(
        env=env_state, counters=counters, episode_step=episode_step
    )
    if render:
        obs = fenv.render_observation_batch(params, env_state)
        if stack.observation_fns:
            obs = jax.vmap(stack.apply_observation)(env_state.key, obs)
    else:
        obs = jnp.zeros(
            (terminated.shape[0], *fenv.observation_shape(params)), jnp.uint8
        )
    return state, obs, reward, terminated, truncated, info


def rollout(
    params: fenv.EnvParams,
    state: VecState,
    policy_fn,
    n_steps: int,
    stack: Optional[WrapperStack] = None,
    max_episode_steps: Optional[int] = None,
    render: bool = True,
    key: Optional[jnp.ndarray] = None,
):
    """Scan `n_steps` of (policy -> step) into one XLA program.

    `policy_fn(obs_or_none, env_state, key) -> action dict`; it receives
    the raw `EnvState` so observation-free controllers (Stanley) skip
    rendering entirely. Returns (final_state, trajectory pytree stacked
    along a leading time axis). Pass `key` to drive policy/noise streams;
    the default derives one from env 0's key via a tagged fold_in --
    usable, but correlated with that env's respawn stream, so callers
    that care thread their own.
    """

    def body(carry, key):
        state = carry
        obs = (
            fenv.render_observation_batch(params, state.env)
            if render
            else None
        )
        action = policy_fn(obs, state.env, key)
        state, _, reward, terminated, truncated, info = step(
            params,
            state,
            action,
            stack=stack,
            max_episode_steps=max_episode_steps,
            render=False,
        )
        out = {
            "reward": reward,
            "terminated": terminated,
            "truncated": truncated,
            "cte": info["cte"],
            "heading_error": info["heading_error"],
        }
        if obs is not None:
            out["obs"] = obs
        return state, out

    if key is None:
        key = jax.random.fold_in(state.env.key[0], 0x7A11)
    keys = jax.random.split(key, n_steps)
    return jax.lax.scan(body, state, keys)
