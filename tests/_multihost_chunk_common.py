"""Shared setup for the 2-process TD3-chunk test (tests/test_multihost.py
mode="chunk") and its single-process oracle.

Both the workers (under `jax.distributed`, 4 virtual CPU devices each)
and the pytest oracle (single process, 8 virtual devices) import the
SAME config, encoder, and in-graph checksum so the comparison is
apples-to-apples: BASELINE config 5 "env shards feeding a sharded
learner" as one cross-process program vs the plain single-process chunk.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

N_ENVS = 16
N_STEPS = 3
SEED = 7


def make_config(map_json: str) -> dict:
    return {
        "sim": {"fps": 30, "observation_space_format": "classes"},
        "car": {"wheelbase": 0.0487, "track_width": 0.027,
                "max_velocity": 0.15, "max_steering_angle": 30,
                "steering_speed": 30, "max_acceleration": 0.1,
                "max_deceleration": 1.0},
        "camera": {"position": [0.0, -0.005, 0.04],
                   "orientation": [22, 0, 0], "resolution": [16, 24],
                   "fov": 80, "max_range": 0.5, "line_thickness": 1},
        "map": {"json_path": map_json, "pixel_per_meter": 450},
    }


def make_setup(map_json: str):
    """(params, td3_cfg, loop_cfg) identical on every process."""
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu.train import td3
    from tinycarlo_tpu.train.td3_loop import LoopConfig

    params = fenv.make_env_params(make_config(map_json))
    cfg = td3.TD3Config(seq_len=2, batch_size=8)
    loop_cfg = LoopConfig(
        replay_size=64, max_episode_steps=16, obs_dtype=jnp.float32,
    )
    return params, cfg, loop_cfg


def encoder_apply(obs):
    """Deterministic toy frozen encoder (the TP-sharded learner is the
    TD3 actor/critic stack; the encoder only needs to be a fixed
    obs -> (B, 256) map both sides compute identically)."""
    x = obs.astype(jnp.float32)
    f = x.reshape(x.shape[0], -1)
    pad = (-f.shape[1]) % 256
    f = jnp.pad(f, ((0, 0), (0, pad)))
    return f.reshape(x.shape[0], -1, 256).mean(axis=1)


def run_sharded_chunk(map_json: str):
    """The DP x TP x SP TD3 chunk as ONE sharded program on the global
    data=4 x model=2 mesh; returns (roll, loss) float checksums.

    Process-count agnostic: under `jax.distributed` with 2 processes it
    is the cross-process program (each host feeds its env rows); on a
    single 8-device process it is the bit-equality ORACLE -- the same
    global mesh produces the same partitioned HLO, so the only
    difference is the collective transport. Placement: per-env leaves
    fed through the per-host path, replay buffer / loop scalars
    replicated, TD3 learner (params + optimizer state) sharded by the
    Megatron TP plan, SP renderer composed inside the chunk."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from tinycarlo_tpu.parallel import mesh as pmesh
    from tinycarlo_tpu.parallel import multihost, tp
    from tinycarlo_tpu.parallel.sp import render_observation_batch_sp
    from tinycarlo_tpu.train.td3_loop import chunk, init_loop

    params, tcfg, loop_cfg = make_setup(map_json)
    mesh = pmesh.make_mesh(data=4, model=2)

    # identical full initial state on every process (same seed) ...
    state0 = init_loop(params, tcfg, loop_cfg, jax.random.PRNGKey(SEED),
                       N_ENVS)

    # ... then placed as global arrays.
    def shard_envs(tree):
        return jax.tree.map(
            lambda l: multihost.host_local_array(
                l.shape, mesh, lambda s, l=l: np.asarray(l)[s]
            ),
            tree,
        )

    def repl(tree):
        return jax.tree.map(
            lambda l: multihost.global_array(l, mesh, P()), tree
        )

    def tp_shard(tree):
        def put(path, leaf):
            spec = tp._spec_for(tp._leaf_names(path))
            return multihost.global_array(leaf, mesh, spec)

        return jax.tree_util.tree_map_with_path(put, tree)

    state = state0.replace(
        vstate=shard_envs(state0.vstate),
        queue=shard_envs(state0.queue),
        noise=shard_envs(state0.noise),
        maneuver=shard_envs(state0.maneuver),
        sigma=shard_envs(state0.sigma),
        ep_count=shard_envs(state0.ep_count),
        buf=repl(state0.buf),
        td3_state=tp_shard(state0.td3_state),
        key=repl(state0.key),
        sigma_target=repl(state0.sigma_target),
    )

    sp_render = lambda p, env_state, out_dtype: render_observation_batch_sp(
        p, env_state, mesh, data_sharded=True, out_dtype=out_dtype,
        interpret=True,
    )

    @jax.jit
    def run(state):
        state, out = chunk(
            state, params=params, cfg=tcfg, loop_cfg=loop_cfg,
            encoder_apply=encoder_apply, n_steps=N_STEPS,
            obs_render_fn=sp_render,
        )
        return checksum_fn(state, out)

    with jax.sharding.set_mesh(mesh):
        roll, loss = run(state)
    return float(roll), float(loss)


def checksum_fn(state, out):
    """In-graph scalar checksums (replicated outputs every process can
    read). `roll` covers the rollout path -- per-env step outputs, the
    feature queue, and the replay rows -- which must match the
    single-process oracle bit-for-bit; `loss` sums the TD3 update
    losses, where the TP psum / SPMD reduction order may differ by f32
    ulps (compared loosely)."""
    f64 = lambda x: jnp.sum(x.astype(jnp.float64))
    roll = (
        f64(out["reward"]) + f64(jnp.abs(out["cte"])) + f64(out["done"])
        + f64(state.queue) + f64(state.buf.storage["x"])
        + f64(state.buf.storage["a"]) + f64(state.buf.storage["r"])
    )
    loss = (
        f64(out["critic1_loss"]) + f64(out["critic2_loss"])
        + f64(out["actor_loss"])
    )
    return roll, loss
