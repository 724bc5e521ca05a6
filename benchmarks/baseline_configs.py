"""Measure BASELINE.json configs 1, 3 and 4 on the real chip.

Config 2 (4096-env simple_layout throughput) is bench.py; config 5
(multi-host) is validated functionally by tests/test_multihost.py (no
multi-host hardware here). This measures the rest:

  1: single env, gym shim, random policy, 64x64 classes -- ours AND the
     reference implementation (when mounted), wall-clock steps/s. The
     single-env number is dominated by per-step dispatch latency on the
     tunneled chip; it is the interactive-UX number, not a throughput
     number.
  3: knuffingen full map, 480x640 classes, maneuver switching, batched
     (BENCH_ENVS3, default 512) -- honest-protocol fused scan, median of
     5, plus the max_visible overflow count at that density.
  4: fused TD3 actor-learner (rollout + replay + update per env-step),
     64 envs x 100-step chunks, steady-state env-steps/s and updates/s.

Usage: python benchmarks/baseline_configs.py [1 3 4]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def config1():
    import gymnasium as gym

    import tinycarlo_tpu  # noqa: F401

    cfg = {
        "sim": {"fps": 30, "observation_space_format": "classes"},
        "car": {"wheelbase": 0.0487, "track_width": 0.027,
                "max_velocity": 0.15, "max_steering_angle": 30,
                "steering_speed": 30, "max_acceleration": 0.1,
                "max_deceleration": 1.0},
        "camera": {"position": [0.0, -0.005, 0.04],
                   "orientation": [22, 0, 0], "resolution": [64, 64],
                   "fov": 80, "max_range": 0.5, "line_thickness": 2},
        "map": {"json_path": os.path.join(
            REPO, "examples/maps/simple_layout.json"),
            "pixel_per_meter": 450},
    }

    def run(env_id_make, steps=200):
        env = env_id_make()
        env.reset(seed=3)
        env.action_space.seed(3)
        # warm one step (first jit compile)
        env.step(env.action_space.sample())
        st = time.perf_counter()
        for _ in range(steps):
            _, _, term, trunc, _ = env.step(env.action_space.sample())
            if term or trunc:
                env.reset()
        return steps / (time.perf_counter() - st)

    ours = run(lambda: gym.make("tinycarlo-v2", config=cfg))
    ref = None
    if os.path.isdir(os.path.join(REFERENCE, "tinycarlo")):
        sys.path.insert(0, REFERENCE)
        from tinycarlo.env import TinyCarloEnv

        rcfg = dict(cfg)
        rcfg["map"] = dict(cfg["map"], json_path=os.path.join(
            REFERENCE, "examples/maps/simple_layout.json"))
        ref = run(lambda: TinyCarloEnv(config=rcfg))
    print(json.dumps({
        "config": 1,
        "metric": "single-env gym shim steps/s (64x64 classes, random)",
        "ours": round(ours, 1),
        "reference": round(ref, 1) if ref else None,
    }))


def config3():
    import jax
    import jax.numpy as jnp

    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector

    n_envs = int(os.environ.get("BENCH_ENVS3", 512))
    # 100-step chunks: the tunneled backend costs ~16 ms per dispatch
    # (bench.py CHUNK fit, docs/KERNELS.md round-3b) -- at ~4.8 ms/step
    # a 20-step chunk paid ~17% pure dispatch overhead
    chunk_steps = int(os.environ.get("BENCH_CHUNK3", 100))
    # BENCH_OBS_FORMAT3=rank measures the rank observation contract on
    # the big-frame workload (BASELINE.md row 2r rationale)
    fmt3 = os.environ.get("BENCH_OBS_FORMAT3", "classes")
    cfg = {
        "sim": {"fps": 30, "observation_space_format": fmt3},
        "car": {"wheelbase": 0.0487, "track_width": 0.027,
                "max_velocity": 0.1, "max_steering_angle": 30,
                "steering_speed": 30, "max_acceleration": 0.1,
                "max_deceleration": 1.0},
        "camera": {"position": [0.0, -0.005, 0.04],
                   "orientation": [22, 0, 0], "resolution": [480, 640],
                   "fov": 80, "max_range": 0.5, "line_thickness": 2},
        "map": {"json_path": os.path.join(
            REPO, "examples/maps/knuffingen.json"),
            "pixel_per_meter": 222},
    }
    params = fenv.make_env_params(cfg)

    def body(carry, i):
        vstate, checksum = carry
        obs = fenv.render_observation_batch(params, vstate.env)
        # contiguous sample keeps the rasterizer live without re-reading
        # the 786 MB obs (bench.py rationale; strided sampling is a
        # relayout-copy trap)
        checksum = checksum + jnp.sum(obs[..., 238:242, :],
                                      dtype=jnp.uint32)
        # maneuver switching: cycle straight/right/left per scan step and
        # env (u-turn entry exercised via the per-step remap)
        man = jnp.mod(
            i + jnp.arange(n_envs, dtype=jnp.int32), 4
        ).astype(jnp.int32)
        action = {
            "car_control": jnp.tile(
                jnp.asarray([0.5, 0.05], jnp.float32), (n_envs, 1)),
            "maneuver": man,
        }
        vstate, _, _, _, _, _ = vector.step(
            params, vstate, action, render=False, max_episode_steps=1000)
        return (vstate, checksum), None

    @jax.jit
    def rollout(vstate):
        (vstate, checksum), _ = jax.lax.scan(
            body, (vstate, jnp.zeros((), jnp.uint32)),
            jnp.arange(chunk_steps, dtype=jnp.int32), unroll=4)
        return vstate, checksum

    vstate, _ = vector.reset(params, jax.random.key(0), n_envs, render=False)
    overflow = int(np.asarray(
        fenv.check_segment_overflow(params, vstate.env)).max())
    vstate, checksum = rollout(vstate)
    assert int(checksum) > 0
    rates = []
    for _ in range(5):
        st = time.perf_counter()
        vstate, checksum = rollout(vstate)
        assert int(checksum) > 0
        rates.append(n_envs * chunk_steps / (time.perf_counter() - st))
    rates.sort()
    print(json.dumps({
        "config": 3,
        "metric": f"knuffingen 480x640 {fmt3} env-steps/s, maneuver"
                  " switching",
        "value": round(rates[2], 1),
        "spread": [round(rates[0], 1), round(rates[-1], 1)],
        "n_envs": n_envs,
        "max_visible_overflow_at_reset": overflow,
    }))


def config4():
    import jax
    import jax.numpy as jnp

    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu.models.tinycar_net import TinycarEncoder
    from tinycarlo_tpu.train import td3
    from tinycarlo_tpu.train.evaluate import standard_stack
    from tinycarlo_tpu.train.il import pre_obs
    from tinycarlo_tpu.train.td3_loop import LoopConfig, chunk, init_loop

    n_envs = int(os.environ.get("BENCH_ENVS4", 64))
    # Defaults reproduce the BASELINE.md headline rows 4/4b (191.5k @1024
    # / 71.6k @64): 200-step chunks + bf16 encoder compute. The earlier
    # 100-step / f32-encoder numbers (181.9k / 55.1k) need
    # BENCH_CHUNK4=100 BENCH_ENC_DTYPE=float32.
    chunk_steps = int(os.environ.get("BENCH_CHUNK4", 200))
    params = fenv.make_env_params(os.path.join(
        REPO, "examples/config_simple_layout.yaml"))
    import dataclasses
    params = params.replace(cfg=dataclasses.replace(
        params.cfg, sim=dataclasses.replace(
            params.cfg.sim, observation_space_format="classes")))
    cfg = td3.TD3Config()
    obs_dtype = {
        "uint8": None, "float32": jnp.float32, "bfloat16": jnp.bfloat16,
    }[os.environ.get("BENCH_OBS_DTYPE", "bfloat16")]
    loop_cfg = LoopConfig(speed=0.4, replay_size=100_000,
                          max_episode_steps=1000, obs_dtype=obs_dtype)
    stack = standard_stack()
    enc_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        os.environ.get("BENCH_ENC_DTYPE", "bfloat16")]
    enc = TinycarEncoder(dtype=enc_dtype)
    obs_shape = fenv.observation_shape(params)
    enc_vars = enc.init(
        jax.random.key(1), pre_obs(jnp.zeros((1, *obs_shape), jnp.uint8)))

    def encoder_apply(obs):
        return enc.apply(enc_vars, pre_obs(obs))

    from functools import partial
    state = init_loop(params, cfg, loop_cfg, jax.random.key(0), n_envs,
                      stack)
    # NOTE: donate_argnums=(0,) would avoid XLA's per-chunk-entry copies
    # of the replay buffers (2 x 1 GB at default sizes, ~0.1 ms/step at
    # 100-step chunks), but buffer donation raises InvalidArgument through
    # the tunneled (axon) TPU backend -- enable it on directly-attached
    # devices.
    run = jax.jit(partial(chunk, params=params, cfg=cfg, loop_cfg=loop_cfg,
                          encoder_apply=encoder_apply, n_steps=chunk_steps,
                          stack=stack))
    state, out = run(state)
    float(np.asarray(out["reward"]).sum())  # warm + sync
    # fill the buffer past one batch so updates actually run
    state, out = run(state)
    float(np.asarray(out["reward"]).sum())
    rates = []
    for _ in range(5):
        st = time.perf_counter()
        state, out = run(state)
        s = float(np.asarray(out["reward"]).sum())  # forced transfer
        rates.append(n_envs * chunk_steps / (time.perf_counter() - st))
    rates.sort()
    updates_per_sec = rates[2] / n_envs * loop_cfg.updates_per_step
    # Pipelined rate: chunks dispatched back-to-back with ONE final sync
    # -- what a real training loop does (the host consumes logs while
    # the next chunk runs), hiding the ~16 ms/dispatch tunnel cost under
    # the previous chunk's execution. The per-chunk rate above keeps the
    # conservative sync-each-chunk protocol for continuity.
    pipel = []
    for _ in range(3):
        st = time.perf_counter()
        acc = None
        for _ in range(5):
            state, out = run(state)
            r = out["reward"]
            acc = r if acc is None else acc + r
        float(np.asarray(acc).sum())  # one sync for all five
        pipel.append(5 * n_envs * chunk_steps / (time.perf_counter() - st))
    pipel.sort()
    print(json.dumps({
        "config": 4,
        "metric": "fused TD3 rollout+replay+update env-steps/s",
        "value": round(rates[2], 1),
        "spread": [round(rates[0], 1), round(rates[-1], 1)],
        "pipelined_value": round(pipel[1], 1),
        "pipelined_spread": [round(pipel[0], 1), round(pipel[-1], 1)],
        "n_envs": n_envs,
        "td3_updates_per_s": round(updates_per_sec, 1),
        "buffer_filled": int(np.asarray(state.buf.filled)),
    }))


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "3", "4"]
    for w in which:
        {"1": config1, "3": config3, "4": config4}[w]()
