"""Fused TD3 rollout+train loop: one jitted chunk runs end-to-end, the
replay fills, and updates kick in once a batch is available."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_env import CONFIG
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.train import td3
from tinycarlo_tpu.train.td3_loop import LoopConfig, chunk, init_loop

B = 4


@pytest.fixture(scope="module")
def params():
    cfg = dict(CONFIG)
    cfg["camera"] = dict(CONFIG["camera"], resolution=[32, 40])
    return fenv.make_env_params(cfg, dtype=jnp.float32)


def test_fused_chunk(params):
    cfg = td3.TD3Config(seq_len=3, batch_size=8)
    loop_cfg = LoopConfig(replay_size=64, max_episode_steps=50)

    def encoder_apply(obs):
        # stand-in encoder: mean-pool image into a 256-d feature
        x = obs.astype(jnp.float32) / 255.0
        f = x.reshape(x.shape[0], -1)
        pad = 256 - (f.shape[1] % 256)
        f = jnp.pad(f, ((0, 0), (0, pad)))
        return f.reshape(x.shape[0], -1, 256).mean(axis=1)

    state = init_loop(params, cfg, loop_cfg, jax.random.key(0), B)
    run = jax.jit(
        partial(
            chunk,
            params=params,
            cfg=cfg,
            loop_cfg=loop_cfg,
            encoder_apply=encoder_apply,
            n_steps=6,
        )
    )
    # first chunk: buffer below batch size at start, fills 4/step
    state, out = run(state)
    assert out["reward"].shape == (6, B)
    assert int(state.buf.filled) == 24
    # at least the later steps trained (filled >= 8 after step 2)
    assert np.any(np.asarray(out["critic1_loss"])[2:] != 0.0)
    actor0 = jax.tree.leaves(state.td3_state.actor)[0].copy()
    state, out = run(state)
    assert int(state.buf.filled) == 48
    assert np.all(np.isfinite(np.asarray(out["critic1_loss"])))
    # actor actually moved across chunks
    assert not np.array_equal(
        np.asarray(actor0), np.asarray(jax.tree.leaves(state.td3_state.actor)[0])
    )
    # queue carries newest feature at slot 0 and is never cleared
    assert np.any(np.asarray(state.queue[:, 0]) != 0)


def test_sigma_per_episode(params):
    """OU sigma is constant within an episode and adopts sigma_target only
    at episode boundaries (reference train_td3.py:179 semantics)."""
    cfg = td3.TD3Config(seq_len=3, batch_size=8)
    loop_cfg = LoopConfig(replay_size=64, max_episode_steps=2)

    def encoder_apply(obs):
        x = obs.astype(jnp.float32)
        f = x.reshape(x.shape[0], -1)
        pad = 256 - (f.shape[1] % 256)
        f = jnp.pad(f, ((0, 0), (0, pad)))
        return f.reshape(x.shape[0], -1, 256).mean(axis=1)

    state = init_loop(params, cfg, loop_cfg, jax.random.key(0), B)
    assert np.all(np.asarray(state.sigma) == np.float32(0.4))
    state = state.replace(sigma_target=jnp.asarray(0.1, jnp.float32))
    run = jax.jit(
        partial(
            chunk,
            params=params,
            cfg=cfg,
            loop_cfg=loop_cfg,
            encoder_apply=encoder_apply,
            n_steps=1,
        )
    )
    state, out = run(state)
    done = np.asarray(out["done"])[0]
    sigma = np.asarray(state.sigma)
    # envs that finished adopted the new level; others kept the old one
    assert np.all(sigma[done] == np.float32(0.1))
    assert np.all(sigma[~done] == np.float32(0.4))
    # with max_episode_steps=2 every env truncates by step 2
    state, out = run(state)
    assert np.all(np.asarray(state.sigma) == np.float32(0.1))


def test_float_obs_path_matches_uint8(params):
    """obs_dtype=float32 feeds the encoder identical values to the uint8
    path, so the whole chunk (losses, rewards, states) is bit-identical."""
    cfg = td3.TD3Config(seq_len=3, batch_size=8)

    def encoder_apply(obs):
        x = obs.astype(jnp.float32) / 255.0 if obs.dtype == jnp.uint8 else obs
        f = x.reshape(x.shape[0], -1)
        pad = 256 - (f.shape[1] % 256)
        f = jnp.pad(f, ((0, 0), (0, pad)))
        return f.reshape(x.shape[0], -1, 256).mean(axis=1)

    outs = []
    states = []
    for obs_dtype in (None, jnp.float32):
        loop_cfg = LoopConfig(
            replay_size=64, max_episode_steps=50, obs_dtype=obs_dtype
        )
        state = init_loop(params, cfg, loop_cfg, jax.random.key(0), B)
        run = jax.jit(
            partial(
                chunk,
                params=params,
                cfg=cfg,
                loop_cfg=loop_cfg,
                encoder_apply=encoder_apply,
                n_steps=4,
            )
        )
        state, out = run(state)
        outs.append(jax.device_get(out))
        states.append(state)
    for k in outs[0]:
        np.testing.assert_array_equal(outs[0][k], outs[1][k], err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(states[0].queue), np.asarray(states[1].queue)
    )


def test_updates_per_step_zero_collect_only(params):
    """--updates 0: rollout-only collection, losses all zero, no crash."""
    cfg = td3.TD3Config(seq_len=3, batch_size=8)
    loop_cfg = LoopConfig(
        replay_size=64, max_episode_steps=50, updates_per_step=0
    )

    def encoder_apply(obs):
        x = obs.astype(jnp.float32)
        f = x.reshape(x.shape[0], -1)
        pad = 256 - (f.shape[1] % 256)
        f = jnp.pad(f, ((0, 0), (0, pad)))
        return f.reshape(x.shape[0], -1, 256).mean(axis=1)

    state = init_loop(params, cfg, loop_cfg, jax.random.key(0), B)
    run = jax.jit(
        partial(chunk, params=params, cfg=cfg, loop_cfg=loop_cfg,
                encoder_apply=encoder_apply, n_steps=3)
    )
    state, out = run(state)
    assert int(state.buf.filled) == 3 * B
    assert np.all(np.asarray(out["critic1_loss"]) == 0.0)


def test_sigma_per_episode(params):
    """LoopConfig.total_episodes runs the reference's exact per-episode
    OU-sigma decay in-graph (train_td3.py:143,179): each env's sigma is
    0.4 * (1 - e / EPISODES) throughout its e-th episode, stepping only
    at that env's own episode boundaries."""
    cfg = td3.TD3Config(seq_len=2, batch_size=8)
    total_eps = 5
    loop_cfg = LoopConfig(
        replay_size=64,
        max_episode_steps=4,  # force frequent truncation boundaries
        updates_per_step=0,
        total_episodes=total_eps,
    )

    def encoder_apply(obs):
        x = obs.astype(jnp.float32) / 255.0
        f = x.reshape(x.shape[0], -1)
        pad = 256 - (f.shape[1] % 256)
        f = jnp.pad(f, ((0, 0), (0, pad)))
        return f.reshape(x.shape[0], -1, 256).mean(axis=1)

    state = init_loop(params, cfg, loop_cfg, jax.random.key(1), B)
    assert float(state.sigma[0]) == pytest.approx(0.4)
    run = jax.jit(
        partial(
            chunk,
            params=params,
            cfg=cfg,
            loop_cfg=loop_cfg,
            encoder_apply=encoder_apply,
            n_steps=30,
        )
    )
    state, out = run(state)
    done = np.asarray(out["done"])  # (T, B)
    sigma = np.asarray(out["sigma"])  # (T, B) post-step sigma
    for b in range(B):
        ep = 0
        for t in range(done.shape[0]):
            if done[t, b]:
                ep += 1
            # sigma AFTER step t = level of the episode in progress next
            expect = 0.4 * max(0.0, 1.0 - ep / total_eps)
            assert sigma[t, b] == pytest.approx(expect, abs=1e-7), (
                b, t, ep
            )
        assert ep >= 5  # the 4-step cap forced enough boundaries
    # state counters agree with the observed boundaries
    np.testing.assert_array_equal(
        np.asarray(state.ep_count), done.sum(axis=0)
    )
