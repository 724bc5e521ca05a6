"""Stanley lateral-control demo: single env through the Gymnasium shim,
or a fully jitted batched rollout (--batch N).

Equivalent of the reference's examples/stanley_control.py:40-63 (K=4,
speed 0.4, maneuver left), plus the batched mode the reference lacks.
"""
import math
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

from examples._common import default_config

K = 4.0
SPEED = 0.4
MANEUVER = 3  # left


def single(render: bool):
    import gymnasium as gym

    import tinycarlo_tpu  # noqa: F401

    env = gym.make(
        "tinycarlo-v2",
        config=default_config(),
        render_mode="human" if render else None,
    )
    _, info = env.reset(seed=4)
    max_steer = env.unwrapped.car.max_steering_angle
    st, steps = time.perf_counter(), 0
    for _ in range(2000):
        steering = (
            (info["heading_error"] + math.atan2(K * info["cte"], SPEED))
            * 180
            / math.pi
            / max_steer
        )
        _, _, terminated, truncated, info = env.step(
            {"car_control": [SPEED, steering], "maneuver": MANEUVER}
        )
        steps += 1
        if terminated or truncated:
            _, info = env.reset()
    print(f"single-env: {steps / (time.perf_counter() - st):.2f} steps/s")
    env.close()


def batched(n_envs: int):
    from functools import partial

    import jax
    import jax.numpy as jnp

    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.train.stanley import stanley_steering

    params = fenv.make_env_params(default_config())
    max_steer = params.cfg.car.max_steering_angle

    def body(carry, _):
        vstate, info = carry
        steering = jnp.clip(
            stanley_steering(info["cte"], info["heading_error"], SPEED, K, max_steer),
            -1, 1,
        )
        action = {
            "car_control": jnp.stack(
                [jnp.full((n_envs,), SPEED, jnp.float32), steering.astype(jnp.float32)],
                axis=-1,
            ),
            "maneuver": jnp.full((n_envs,), MANEUVER, jnp.int32),
        }
        vstate, _, rew, term, trunc, info = vector.step(
            params, vstate, action, render=False, max_episode_steps=1000
        )
        return (vstate, info), (rew, info["cte"])

    @jax.jit
    def rollout(vstate, info, n=500):
        return jax.lax.scan(body, (vstate, info), None, length=n)

    vstate, _ = vector.reset(params, jax.random.key(0), n_envs, render=False)
    info = jax.vmap(lambda s: fenv._info(params, s))(vstate.env)
    (vstate, info), _ = jax.block_until_ready(rollout(vstate, info))  # compile
    st = time.perf_counter()
    (vstate, info), (rews, ctes) = jax.block_until_ready(rollout(vstate, info))
    dt = time.perf_counter() - st
    print(
        f"batched {n_envs} envs: {n_envs * 500 / dt:,.0f} env-steps/s | "
        f"mean |cte| {float(jnp.abs(ctes).mean()):.4f} m"
    )


if __name__ == "__main__":
    if "--batch" in sys.argv:
        batched(int(sys.argv[sys.argv.index("--batch") + 1]))
    else:
        single("--render" in sys.argv)
