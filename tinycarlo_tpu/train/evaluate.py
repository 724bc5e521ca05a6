"""Policy evaluation harness, parity with the reference's `evaluate`
(reference: examples/benchmark_tinycar_net.py:23-76).

Same wrapper stack (CTELinearReward(0.03,+1/-1) + CTETermination(0.1,5) +
CrashTermination), same metrics dict (total_reward, cte_avg/var on |cte|,
heading_error_avg/var, terminations, steps_per_s). TPU-native difference:
the reference steps one env `steps*episodes` times; here the `episodes`
run as a parallel batch inside one jitted scan, and steps_per_s counts
total env-steps (policy inference included) over wall-clock.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from tinycarlo_tpu import env as fenv
from tinycarlo_tpu import vector
from tinycarlo_tpu.wrapper.functional import (
    WrapperStack,
    crash_termination,
    cte_linear_reward,
    cte_termination,
)


def standard_stack() -> WrapperStack:
    """The reference eval wrapper stack (benchmark_tinycar_net.py:32-34)."""
    return WrapperStack(
        reward_fns=(
            partial(cte_linear_reward, min_cte=0.03, max_reward=1.0, min_reward=-1.0),
        ),
        termination_fns=(
            partial(cte_termination, max_cte=0.1, number_of_steps=5),
            partial(crash_termination, velocity_threshold=0.005, number_of_steps=10),
        ),
    )


def evaluate(
    act_fn: Callable,
    params: fenv.EnvParams,
    maneuver: int,
    carry_init,
    seed: int = 0,
    speed: float = 0.35,
    steps: int = 5000,
    episodes: int = 5,
    sequential: bool = False,
) -> Dict[str, float]:
    """Run `episodes` rollouts of `steps` each.

    `act_fn(obs_uint8 (B,...), maneuver (B,), carry, key) -> (steering (B,),
    carry)` -- the carry holds e.g. a temporal feature queue
    (benchmark_tinycar_net.py:36-44). Terminated/truncated envs auto-reset
    in-graph; terminations counts terminated only, like the reference
    (benchmark_tinycar_net.py:60-62).

    `sequential=False` (default): the `episodes` run as a parallel batch --
    equivalent in expectation, maximally fast. `sequential=True` is the
    strict-parity mode reproducing the reference's episode semantics
    (benchmark_tinycar_net.py:46-65): ONE env stepped `steps*episodes`
    times in sequence, reset on termination and additionally whenever
    `i % steps == 0` (including i=0, as the reference does), the act_fn
    carry rolling across resets uncleared. Use it when comparing
    per-episode numbers against reference-published evaluations.
    """
    stack = standard_stack()
    B = 1 if sequential else episodes
    n_steps = steps * episodes if sequential else steps
    m_arr = jnp.full((B,), maneuver, jnp.int32)
    act_m = jnp.where(m_arr != 2, m_arr, 3)

    def body(c, xs):
        vstate, carry = c
        key, i = xs
        obs = fenv.render_observation_batch(params, vstate.env)
        steering, carry = act_fn(obs, m_arr, carry, key)
        action = {
            "car_control": jnp.stack(
                [jnp.full((B,), speed, steering.dtype), steering], axis=-1
            ),
            "maneuver": act_m,
        }
        vstate, _, rew, term, trunc, info = vector.step(
            params, vstate, action, stack=stack, render=False
        )
        if sequential:
            # reference benchmark_tinycar_net.py:63-65: a fresh episode
            # starts every `steps` iterations regardless of termination;
            # the cond keeps the respawn compute off the other steps
            vstate = jax.lax.cond(
                (i % steps) == 0,
                lambda vs: vector.reset(
                    params, jax.random.fold_in(key, 2), B, stack=stack,
                    render=False,
                )[0],
                lambda vs: vs,
                vstate,
            )
        out = {
            "reward": rew,
            "terminated": term,
            "cte": jnp.abs(info["cte"]),
            "heading_error": jnp.abs(info["heading_error"]),
            "position": info["position"],
        }
        return (vstate, carry), out

    @partial(jax.jit, static_argnames=("n",))
    def run(key, carry, n):
        vstate, _ = vector.reset(params, key, B, stack=stack, render=False)
        keys = jax.random.split(jax.random.fold_in(key, 1), n)
        idx = jnp.arange(n, dtype=jnp.int32)
        (_, carry), traj = jax.lax.scan(body, (vstate, carry), (keys, idx))
        return traj

    # segment-budget guard: verify the rasterizer's max_visible_segments
    # budget fits this map/camera before trusting the metrics (the
    # reference draws unbounded lists and can never drop pixels).
    @jax.jit
    def _overflow(key):
        vstate, _ = vector.reset(params, key, B, stack=stack, render=False)
        return jnp.sum(fenv.check_segment_overflow(params, vstate.env))

    ov = int(_overflow(jax.random.key(seed)))
    if ov:
        import warnings

        warnings.warn(
            f"evaluate: {ov} rasterizer slot copies dropped at spawn states"
            " -- observations are losing pixels; raise"
            " CameraConfig.max_visible_segments"
        )

    # compile outside the clock, then measure (reference measures inference
    # time per step; we measure the whole fused rollout). `n` is a static
    # arg, so the warmup must compile the ACTUAL n_steps program -- AOT
    # lower/compile does that without executing a throwaway rollout.
    compiled = run.lower(jax.random.key(seed), carry_init, n_steps).compile()
    st = time.perf_counter()
    traj = jax.block_until_ready(compiled(jax.random.key(seed), carry_init))
    wall = time.perf_counter() - st

    cte = np.asarray(traj["cte"]).reshape(-1)
    he = np.asarray(traj["heading_error"]).reshape(-1)
    return {
        "cte_avg": float(cte.mean()),
        "cte_var": float(cte.var()),
        "heading_error_avg": float(he.mean()),
        "heading_error_var": float(he.var()),
        "terminations": int(np.asarray(traj["terminated"]).sum()),
        "steps_per_s": steps * episodes / wall,
        "total_reward": float(np.asarray(traj["reward"]).sum()),
        "positions": np.asarray(traj["position"]).reshape(-1, 2),
    }


def combo_policy(model, variables):
    """act_fn for a (non-temporal) TinycarCombo: obs -> steering.
    Carry is unused (pass None via `carry_init=None`)."""
    from tinycarlo_tpu.models.tinycar_net import pre_obs

    def act(obs, m, carry, key):
        x = pre_obs(obs)
        mh = jax.nn.one_hot(m, model.maneuver_dim)
        out = model.apply(variables, x, mh)
        return out[:, 0], carry

    return act


def temporal_policy(encoder, enc_variables, actor, actor_params, seq_len: int):
    """act_fn for encoder + temporal actor; carry is the rolled feature
    queue (B, seq_len, F), mirroring benchmark_tinycar_net.py:38-41."""
    from tinycarlo_tpu.models.tinycar_net import pre_obs

    def act(obs, m, queue, key):
        f = encoder.apply(enc_variables, pre_obs(obs))
        queue = jnp.roll(queue, 1, axis=1).at[:, 0].set(f)
        mh = jax.nn.one_hot(m, actor.maneuver_dim)
        out = actor.apply({"params": actor_params}, queue, mh)
        return out[:, 0], queue

    return act
