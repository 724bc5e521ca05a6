"""Training-stack tests: replay semantics, TD3 update math vs a torch
oracle built from the reference's update equations, Stanley controller
parity, IL train step, and the evaluate harness end-to-end.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_env import CONFIG
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.train import (
    ILConfig,
    TD3Config,
    il_create,
    il_train_step,
    ou_step,
    stanley_steering,
    td3_create,
    td3_train_step,
)
from tinycarlo_tpu.train import replay
from tinycarlo_tpu.train.td3 import (
    actor_update,
    apply_actor,
    apply_critic,
    critic_update,
    select_action,
)


def test_replay_ring_and_sample():
    buf = replay.create(8, {"x": jnp.zeros((3,)), "r": jnp.zeros(())})
    key = jax.random.key(0)
    batch = {
        "x": jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
        "r": jnp.arange(4, dtype=jnp.float32),
    }
    buf = replay.add_batch(buf, key, batch)
    assert int(buf.filled) == 4
    buf = replay.add_batch(buf, key, batch)
    assert int(buf.filled) == 8
    # buffer full: inserts evict random slots, size stays
    buf = replay.add_batch(buf, jax.random.key(1), batch)
    assert int(buf.filled) == 8
    s = replay.sample(buf, jax.random.key(2), 6)
    assert s["x"].shape == (6, 3) and s["r"].shape == (6,)


def test_replay_save_load(tmp_path):
    buf = replay.create(4, {"x": jnp.zeros((2,))})
    buf = replay.add_batch(
        buf, jax.random.key(0), {"x": jnp.ones((3, 2))}
    )
    fn = str(tmp_path / "buf.npz")
    replay.save(buf, fn)
    buf2 = replay.load(fn)
    assert int(buf2.filled) == 3
    np.testing.assert_array_equal(
        np.asarray(buf.storage["x"]), np.asarray(buf2.storage["x"])
    )


@pytest.fixture(scope="module")
def td3_setup():
    cfg = TD3Config(seq_len=4, batch_size=16)
    state = td3_create(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.standard_normal((16, 4, 256)), jnp.float32),
        "m": jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, 16)), 3),
        "a": jnp.asarray(rng.standard_normal((16, 1)), jnp.float32),
        "r": jnp.asarray(rng.standard_normal((16, 1)), jnp.float32),
        "x1": jnp.asarray(rng.standard_normal((16, 4, 256)), jnp.float32),
    }
    batch["m1"] = batch["m"]
    return cfg, state, batch


def test_td3_critic_target_math(td3_setup):
    """The critic regression target is min(Q1',Q2')*gamma + r with target
    nets (reference train_td3.py:105-112) -- check the loss value against a
    hand computation."""
    cfg, state, batch = td3_setup
    ta = apply_actor(cfg, state.actor_target, batch["x1"], batch["m1"])
    q1 = apply_critic(cfg, state.critic1_target, batch["x1"], batch["m1"], ta)
    q2 = apply_critic(cfg, state.critic2_target, batch["x1"], batch["m1"], ta)
    target = np.minimum(np.asarray(q1), np.asarray(q2)) * cfg.discount_factor + np.asarray(batch["r"])
    pred = np.asarray(
        apply_critic(cfg, state.critic1, batch["x"], batch["m"], batch["a"])
    )
    expected_l1 = np.mean((target - pred) ** 2)
    _, (l1, l2) = critic_update(state, cfg, batch)
    assert float(l1) == pytest.approx(expected_l1, rel=1e-5)


def test_td3_delayed_actor_and_soft_updates(td3_setup):
    cfg, state, batch = td3_setup
    step = jax.jit(partial(td3_train_step, cfg=cfg))
    s1, losses1 = step(state, batch=batch)
    # step 1: no actor update (policy_delay=2) -> targets unchanged
    assert float(losses1["actor_loss"]) == 0.0
    chex_equal = lambda a, b: np.array_equal(np.asarray(a), np.asarray(b))
    a_leaf = jax.tree.leaves(state.actor_target)[0]
    a_leaf1 = jax.tree.leaves(s1.actor_target)[0]
    assert chex_equal(a_leaf, a_leaf1)
    # critics did move
    assert not chex_equal(
        jax.tree.leaves(state.critic1)[0], jax.tree.leaves(s1.critic1)[0]
    )
    s2, losses2 = step(s1, batch=batch)
    # step 2: actor updates, targets soft-move by tau
    assert float(losses2["actor_loss"]) != 0.0
    old_t = jax.tree.leaves(s1.critic1_target)[0]
    new_online = jax.tree.leaves(s2.critic1)[0]
    new_t = jax.tree.leaves(s2.critic1_target)[0]
    expected = cfg.tau * np.asarray(new_online) + (1 - cfg.tau) * np.asarray(old_t)
    np.testing.assert_allclose(np.asarray(new_t), expected, rtol=1e-6)


def test_select_action_clip_and_shift(td3_setup):
    cfg, state, batch = td3_setup
    a = select_action(
        state, cfg, batch["x"], batch["m"],
        noise=jnp.full((16, 1), 10.0), steering_shift=-0.01,
    )
    assert np.all(np.asarray(a) == 1.0)  # clipped
    a2 = select_action(
        state, cfg, batch["x"], batch["m"], noise=jnp.zeros((16, 1)),
        steering_shift=-0.01,
    )
    a0 = apply_actor(cfg, state.actor, batch["x"], batch["m"])
    np.testing.assert_allclose(
        np.asarray(a2), np.clip(np.asarray(a0) - 0.01, -1, 1), rtol=1e-6
    )


def test_stanley_matches_reference_formula():
    """steering = (heading_error + atan2(K*cte, speed))*180/pi/max_angle
    (reference train_stanley_il.py:62-65)."""
    import math

    rng = np.random.default_rng(3)
    for _ in range(20):
        cte = rng.uniform(-0.1, 0.1)
        he = rng.uniform(-1, 1)
        expected = (he + math.atan2(5 * cte, 0.5)) * 180 / math.pi / 35.0
        got = float(stanley_steering(jnp.asarray(cte), jnp.asarray(he), 0.5, 5.0, 35.0))
        assert got == pytest.approx(expected, rel=1e-6)


def test_ou_noise_stats():
    """OU process is mean-reverting with stationary std sigma/sqrt(2*theta - theta^2)."""
    key = jax.random.key(0)
    n = jnp.zeros((512,))
    vals = []
    for i in range(300):
        key, sub = jax.random.split(key)
        n = ou_step(n, sub, theta=0.1, sigma=0.4)
        if i > 100:
            vals.append(np.asarray(n))
    std = np.concatenate(vals).std()
    expected = 0.4 / np.sqrt(2 * 0.1 - 0.1**2)
    assert std == pytest.approx(expected, rel=0.15)


def test_il_train_step_reduces_loss():
    cfg = ILConfig(learning_rate=1e-3)
    state = il_create(jax.random.key(0), (5, 64, 160), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 64, 160, 5)), jnp.float32)
    m = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, 8)), 3)
    y = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 1)), jnp.float32)
    batch = {"x": x, "m": m, "y": y}
    step = jax.jit(partial(il_train_step, cfg=cfg))
    state, first = step(state, batch=batch)
    for _ in range(30):
        state, loss = step(state, batch=batch)
    assert float(loss) < float(first)


def test_il_turn_weighted_loss():
    """turn_weight=w weights sample i by 1 + w*min(|y_i|,1), normalized:
    the reported loss matches the hand-computed weighted mean, and w=0
    reproduces the plain-MSE loss exactly."""
    state = il_create(jax.random.key(0), (5, 64, 160), ILConfig())
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((8, 64, 160, 5)), jnp.float32)
    m = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, 8)), 3)
    y = jnp.asarray(rng.uniform(-2.0, 2.0, (8, 1)), jnp.float32)
    batch = {"x": x, "m": m, "y": y}

    out = state.model.apply(
        {"params": state.variables["params"],
         "batch_stats": state.variables["batch_stats"]},
        x, m, train=True, mutable=["batch_stats"],
    )[0]
    w = 1.0 + 2.0 * np.minimum(np.abs(np.asarray(y)), 1.0)
    err = (np.asarray(out) - np.asarray(y)) ** 2
    expect_w = float((w * err).sum() / w.sum())
    expect_plain = float(err.mean())

    _, loss_w = il_train_step(state, ILConfig(turn_weight=2.0), batch)
    _, loss_plain = il_train_step(state, ILConfig(), batch)
    np.testing.assert_allclose(float(loss_w), expect_w, rtol=1e-5)
    np.testing.assert_allclose(float(loss_plain), expect_plain, rtol=1e-5)
    assert abs(expect_w - expect_plain) > 1e-6  # the weighting does bite


def test_evaluate_harness_stanley():
    """evaluate() runs the reference metric dict end-to-end with a Stanley
    act_fn standing in for a net policy."""
    from tinycarlo_tpu.train import evaluate as ev_fn

    class ev:
        evaluate = staticmethod(ev_fn)

    params = fenv.make_env_params(CONFIG, dtype=jnp.float64)

    def act(obs, m, carry, key):
        info = carry  # unused: drive straight with small corrections
        return jnp.zeros((obs.shape[0],), jnp.float64), carry

    res = ev.evaluate(
        act, params, maneuver=0, carry_init=None, steps=30, episodes=3
    )
    for k in (
        "cte_avg",
        "cte_var",
        "heading_error_avg",
        "heading_error_var",
        "terminations",
        "steps_per_s",
        "total_reward",
    ):
        assert k in res
    assert res["steps_per_s"] > 0
    assert res["positions"].shape == (90, 2)


def test_evaluate_sequential_strict():
    """sequential=True reproduces the reference's episode structure
    (benchmark_tinycar_net.py:46-65): one env, steps*episodes iterations,
    trajectory metrics over every iteration."""
    from tinycarlo_tpu.train import evaluate as ev_fn

    params = fenv.make_env_params(CONFIG, dtype=jnp.float64)

    def act(obs, m, carry, key):
        return jnp.zeros((obs.shape[0],), jnp.float64), carry

    res = ev_fn(
        act, params, maneuver=0, carry_init=None, steps=10, episodes=3,
        sequential=True,
    )
    assert res["positions"].shape == (30, 2)
    assert np.isfinite(res["cte_avg"])
    # the forced i%steps==0 resets respawn the env: position jumps of a
    # respawn are possible but the trajectory stays on-map (finite)
    assert np.all(np.isfinite(res["positions"]))
