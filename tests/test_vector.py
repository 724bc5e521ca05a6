"""Vector env tests: vmap-vs-single equivalence, auto-reset, fused
wrapper stack, scan rollout, and sharding over the virtual 8-device mesh.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tests.test_env import CONFIG
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu import vector
from tinycarlo_tpu.wrapper.functional import (
    WrapperStack,
    cte_linear_reward,
    cte_termination,
    laneline_crossing_termination,
)

N = 8


@pytest.fixture(scope="module")
def params():
    return fenv.make_env_params(CONFIG, dtype=jnp.float64)


def _batch_action(key, n):
    steer = jax.random.uniform(key, (n,), jnp.float64, -0.5, 0.5)
    return {
        "car_control": jnp.stack([jnp.full((n,), 0.6), steer], axis=-1),
        "maneuver": jnp.zeros((n,), jnp.int32),
    }


def test_vmap_matches_single(params):
    """Each lane of the batch evolves exactly like a single env stepped
    with the same spawn + actions."""
    key = jax.random.key(0)
    vstate, vobs = vector.reset(params, key, N)
    # single-env copies of lane 3
    lane = 3
    single = jax.tree.map(lambda x: x[lane], vstate.env)
    vstep = jax.jit(partial(vector.step, params, auto_reset=False))
    sstep = jax.jit(partial(fenv.step, params))
    for i in range(5):
        action = _batch_action(jax.random.key(i), N)
        vstate, vobs, vrew, vterm, vtrunc, vinfo = vstep(vstate, action=action)
        a1 = jax.tree.map(lambda x: x[lane], action)
        single, obs1, rew1, term1, trunc1, info1 = sstep(single, a1)
        np.testing.assert_array_equal(np.asarray(vobs[lane]), np.asarray(obs1))
        assert float(vrew[lane]) == float(rew1)
        np.testing.assert_allclose(
            np.asarray(vstate.env.car.position[lane]),
            np.asarray(single.car.position),
            rtol=0,
            atol=0,
        )


def test_auto_reset(params):
    """Finished envs (here: time-limit truncation) respawn in-graph with
    fresh zero-velocity spawn state and a reset step counter."""
    vstate, _ = vector.reset(params, jax.random.key(1), N, render=False)
    hard_left = {
        "car_control": jnp.tile(jnp.asarray([1.0, 1.0]), (N, 1)),
        "maneuver": jnp.zeros((N,), jnp.int32),
    }
    step_fn = jax.jit(
        partial(vector.step, params, render=False, max_episode_steps=20)
    )
    for i in range(25):
        vel_before = np.asarray(vstate.env.car.velocity)
        vstate, _, rew, term, trunc, _ = step_fn(vstate, action=hard_left)
        done = np.asarray(term | trunc)
        if i == 19:
            assert done.all(), "all envs hit the 20-step time limit together"
            vel = np.asarray(vstate.env.car.velocity)
            assert np.all(vel == 0.0), "respawned envs start at rest"
            assert np.all(np.asarray(vstate.episode_step) == 0)
            spawn_pos = np.asarray(params.map_data.spawns.position)
            pos = np.asarray(vstate.env.car.position)
            for p in pos:
                assert np.min(np.linalg.norm(spawn_pos - p, axis=1)) < 1e-12
        elif i < 19:
            assert not done.any()
    # after respawn the envs keep stepping normally
    assert np.all(np.abs(np.asarray(vstate.env.car.velocity)) > 0)


def test_wrapper_stack_fused(params):
    names = params.map_data.laneline_names
    tw = params.cfg.car.track_width
    stack = WrapperStack(
        reward_fns=(partial(cte_linear_reward, min_cte=0.03, max_reward=1.0, min_reward=-1.0),),
        termination_fns=(
            partial(cte_termination, max_cte=0.1, number_of_steps=5),
            partial(
                laneline_crossing_termination,
                track_width=tw,
                lanelines=("outer",),
                layer_names=names,
            ),
        ),
    )
    # laneline_crossing takes no counter: adapt to the (info, counter) form
    stack = WrapperStack(
        reward_fns=stack.reward_fns,
        termination_fns=(
            partial(cte_termination, max_cte=0.1, number_of_steps=5),
            lambda info, c: (
                laneline_crossing_termination(info, tw, ("outer",), names),
                c,
            ),
        ),
    )
    vstate, _ = vector.reset(params, jax.random.key(2), N, stack=stack, render=False)
    step_fn = jax.jit(
        partial(vector.step, params, stack=stack, render=False)
    )
    for i in range(50):
        vstate, _, rew, term, trunc, info = step_fn(
            vstate, action=_batch_action(jax.random.key(100 + i), N)
        )
    # shaped reward is bounded by the stack's ramp
    assert np.all(np.asarray(rew) <= 1.0) and np.all(np.asarray(rew) >= -1.0)


def test_rollout_scan(params):
    vstate, _ = vector.reset(params, jax.random.key(3), N, render=False)

    def policy(obs, env_state, key):
        n = env_state.car.rotation.shape[0]
        steer = jax.random.uniform(key, (n,), jnp.float64, -0.3, 0.3)
        return {
            "car_control": jnp.stack([jnp.full((n,), 0.5), steer], axis=-1),
            "maneuver": jnp.zeros((n,), jnp.int32),
        }

    final, traj = jax.jit(
        partial(vector.rollout, params, policy_fn=policy, n_steps=20, render=False)
    )(vstate)
    assert traj["reward"].shape == (20, N)
    assert traj["cte"].shape == (20, N)
    assert np.isfinite(np.asarray(traj["reward"])).all()


def test_sharded_batch_runs(params):
    """The batch axis shards over the 8-device mesh and the same program
    executes under NamedSharding (multi-chip layout, per SURVEY.md §2.5 DP row)."""
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    vstate, _ = vector.reset(params, jax.random.key(4), 16, render=False)
    sharding = NamedSharding(mesh, P("data"))
    vstate = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))
        ),
        vstate,
    )
    action = _batch_action(jax.random.key(5), 16)
    step_fn = jax.jit(partial(vector.step, params, render=False))
    vstate, _, rew, term, trunc, _ = step_fn(vstate, action=action)
    assert rew.shape == (16,)
    assert np.isfinite(np.asarray(rew)).all()
