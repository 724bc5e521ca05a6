"""Gymnasium shim + wrapper parity tests against the reference.

Both frameworks get identical seeds, configs, and action sequences; we
assert the RNG spawn stream, trajectories, wrapped rewards, and
terminations match (reference: tinycarlo/env.py, tinycarlo/wrapper/*).
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, SIMPLE_LAYOUT_MAP, requires_reference
from tests.test_env import CONFIG
from tinycarlo_tpu.gym_env import TinyCarloEnv
from tinycarlo_tpu.wrapper import (
    CrashTerminationWrapper,
    CTELinearRewardWrapper,
    CTETerminationWrapper,
    LanelineCrossingTerminationWrapper,
    LanelineSparseRewardWrapper,
    NoiseObservationWrapper,
)


@pytest.fixture(scope="module")
def envs():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from tinycarlo.env import TinyCarloEnv as RefEnv

    ours = TinyCarloEnv(config=CONFIG, dtype=jnp.float64)
    ref = RefEnv(config=CONFIG)
    yield ours, ref
    ours.close()
    ref.close()


def _actions(n, seed=7):
    # python floats, not float32 arrays: the reference's np.clip keeps the
    # input dtype, so float32 actions quantize its internal velocity math
    # to f32 -- parity is defined on the float64 action stream.
    rng = np.random.default_rng(seed)
    steer = rng.uniform(-0.6, 0.6, size=n)
    return [{"car_control": [0.6, float(s)], "maneuver": 0} for s in steer]


def test_spaces(envs):
    ours, ref = envs
    assert ours.observation_space.shape == ref.observation_space.shape
    assert ours.observation_space.dtype == ref.observation_space.dtype
    assert ours.action_space["car_control"].shape == (2,)
    assert ours.action_space["maneuver"].n == 4


@requires_reference
def test_reset_rng_parity(envs):
    """Seeded resets land on the same spawn pose across many draws
    (reference map.py:51-69 rejection sampling replayed exactly)."""
    ours, ref = envs
    for seed in (0, 1, 42, 1234):
        _, info_o = ours.reset(seed=seed)
        _, info_r = ref.reset(seed=seed)
        np.testing.assert_allclose(
            info_o["position"], info_r["position"], atol=0, rtol=0
        )
        assert info_o["orientation"] == pytest.approx(info_r["orientation"], abs=0)
        # consecutive resets continue the same stream
        for _ in range(5):
            _, info_o = ours.reset()
            _, info_r = ref.reset()
            np.testing.assert_allclose(
                info_o["position"], info_r["position"], atol=0, rtol=0
            )


@requires_reference
def test_unwrapped_step_parity(envs):
    """Default reward/termination + info dict parity over a driven rollout."""
    ours, ref = envs
    ours.reset(seed=3)
    ref.reset(seed=3)
    for action in _actions(60):
        _, rew_o, term_o, trunc_o, info_o = ours.step(action)
        _, rew_r, term_r, trunc_r, info_r = ref.step(action)
        assert rew_o == pytest.approx(rew_r, abs=1e-9)
        assert (term_o, trunc_o) == (term_r, trunc_r)
        assert info_o["cte"] == pytest.approx(info_r["cte"], abs=1e-9)
        assert info_o["heading_error"] == pytest.approx(
            info_r["heading_error"], abs=1e-9
        )
        assert set(info_o["laneline_distances"]) == set(
            info_r["laneline_distances"]
        )
        for k in info_r["laneline_distances"]:
            assert info_o["laneline_distances"][k] == pytest.approx(
                info_r["laneline_distances"][k], abs=1e-9
            )
        if term_r or trunc_r:
            ours.reset(seed=11)
            ref.reset(seed=11)


@requires_reference
def test_wrapped_stack_parity(envs):
    """The reference TD3 wrapper stack (train_td3.py:60-62) + laneline
    shaping produce identical rewards/terminations on both frameworks."""
    ours, ref = envs
    import tinycarlo.wrapper as refw

    def stack(env, w):
        env = w.CTELinearRewardWrapper(env, min_cte=0.03, max_reward=1.0, min_reward=-1.0)
        env = w.LanelineSparseRewardWrapper(env, {"outer": -2.0})
        env = w.CTETerminationWrapper(env, max_cte=0.1, number_of_steps=5)
        env = w.LanelineCrossingTerminationWrapper(env, ["outer"])
        env = w.CrashTerminationWrapper(env, number_of_steps=10)
        return env

    import tinycarlo_tpu.wrapper as ourw

    ours_w = stack(ours, ourw)
    ref_w = stack(ref, refw)
    ours_w.reset(seed=5)
    ref_w.reset(seed=5)
    terms = 0
    for action in _actions(120, seed=9):
        _, rew_o, term_o, trunc_o, info_o = ours_w.step(action)
        _, rew_r, term_r, trunc_r, info_r = ref_w.step(action)
        assert rew_o == pytest.approx(rew_r, abs=1e-9)
        assert (term_o, trunc_o) == (term_r, trunc_r)
        if term_r or trunc_r:
            terms += 1
            ours_w.reset(seed=13)
            ref_w.reset(seed=13)
    # the random policy should have triggered at least one termination so
    # the consecutive-counter logic is actually exercised
    assert terms >= 1


def test_noise_observation_wrapper(envs):
    ours, _ = envs
    env = NoiseObservationWrapper(ours, blob_max_radius=20, n_blobs=5)
    env.reset(seed=0)
    obs, *_ = env.step(
        {"car_control": np.array([0.3, 0.0], np.float32), "maneuver": 0}
    )
    assert obs.shape == ours.observation_space.shape
    assert obs.dtype == np.uint8


def test_camera_update_params(envs):
    """Domain-randomization hook: mutating camera params changes the view
    (reference camera.py:48-50, train_stanley_il.py:53-57)."""
    ours, _ = envs
    ours.reset(seed=21)
    before = ours._camera_rgb()
    old_pitch, old_fov = ours.camera.orientation[0], ours.camera.fov
    ours.camera.orientation[0] = 10.0
    ours.camera.fov = 120.0
    ours.camera.update_params()
    after = ours._camera_rgb()
    assert before.shape == after.shape
    assert np.any(before != after)
    ours.camera.orientation[0] = old_pitch
    ours.camera.fov = old_fov
    ours.camera.update_params()


def test_debug_staged_step(monkeypatch, capsys):
    """DEBUG=1 takes the staged path with the reference's per-stage
    timing prints (env.py:144-145) and returns the same step results as
    the fused path."""
    from tinycarlo_tpu.gym_env import TinyCarloEnv

    env = TinyCarloEnv(config=CONFIG, dtype=jnp.float64)
    env.reset(seed=7)
    action = {"car_control": [0.4, 0.1], "maneuver": 0}
    obs_f, rew_f, te_f, tr_f, info_f = env.step(action)
    monkeypatch.setenv("DEBUG", "1")
    obs_d, rew_d, te_d, tr_d, info_d = env.step(action)
    out = capsys.readouterr().out
    assert "all:" in out and "obs render" in out and "car step" in out
    assert "obs projection:" in out
    # second identical action from the post-step state: both paths share
    # the same jitted math, so the debug step is a normal env step
    assert obs_d.shape == obs_f.shape
    assert isinstance(rew_d, float) and isinstance(te_d, bool)
    monkeypatch.delenv("DEBUG")
    # fused path resumes cleanly
    env.step(action)
