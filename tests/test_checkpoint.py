"""Orbax checkpoint round-trips for learner and env state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_env import CONFIG
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu import vector
from tinycarlo_tpu.train import TD3Config, td3_create
from tinycarlo_tpu.utils import checkpoint as ckpt


def test_td3_state_roundtrip(tmp_path):
    cfg = TD3Config(seq_len=3)
    state = td3_create(jax.random.key(0), cfg)
    path = str(tmp_path / "td3")
    ckpt.save(path, state)
    restored = ckpt.restore(path, example=state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_env_state_resume_mid_episode(tmp_path):
    """Batched env state checkpoints and resumes to identical trajectories."""
    params = fenv.make_env_params(CONFIG, dtype=jnp.float64)
    vstate, _ = vector.reset(params, jax.random.key(0), 4, render=False)
    action = {
        "car_control": jnp.tile(jnp.asarray([0.5, 0.1]), (4, 1)),
        "maneuver": jnp.zeros((4,), jnp.int32),
    }
    from functools import partial

    step = jax.jit(partial(vector.step, params, render=False))
    for _ in range(5):
        vstate, *_ = step(vstate, action=action)
    path = str(tmp_path / "env")
    ckpt.save(path, vstate)
    restored = ckpt.restore(path, example=vstate)
    a, *_ = step(vstate, action=action)
    b, *_ = step(restored, action=action)
    np.testing.assert_array_equal(
        np.asarray(a.env.car.position), np.asarray(b.env.car.position)
    )
