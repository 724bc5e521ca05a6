"""Device-timeline profile of the fused TD3 chunk (BASELINE config 4).

Same trace-mining approach as profile_step.py, applied to the
rollout+replay+update loop so the obs->encoder fusion work (VERDICT
round-2 item 3) optimizes measured cost, not guessed cost.

Usage: BENCH_ENVS4=64 python benchmarks/profile_td3.py [trace_dir]
"""
import collections
import dataclasses
import glob
import gzip
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ENVS = int(os.environ.get("BENCH_ENVS4", 64))
STEPS = 20


def main():
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu.models.tinycar_net import TinycarEncoder
    from tinycarlo_tpu.train import td3
    from tinycarlo_tpu.train.evaluate import standard_stack
    from tinycarlo_tpu.train.il import pre_obs
    from tinycarlo_tpu.train.td3_loop import LoopConfig, chunk, init_loop

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/td3_trace"
    params = fenv.make_env_params(
        os.path.join(REPO, "examples/config_simple_layout.yaml")
    )
    params = params.replace(cfg=dataclasses.replace(
        params.cfg, sim=dataclasses.replace(
            params.cfg.sim, observation_space_format="classes")))
    cfg = td3.TD3Config()
    obs_dtype = {
        "uint8": None, "float32": jnp.float32, "bfloat16": jnp.bfloat16,
    }[os.environ.get("BENCH_OBS_DTYPE", "uint8")]
    loop_cfg = LoopConfig(speed=0.4, replay_size=100_000,
                          max_episode_steps=1000, obs_dtype=obs_dtype)
    stack = standard_stack()
    enc = TinycarEncoder()
    obs_shape = fenv.observation_shape(params)
    enc_vars = enc.init(
        jax.random.key(1), pre_obs(jnp.zeros((1, *obs_shape), jnp.uint8)))

    def encoder_apply(obs):
        return enc.apply(enc_vars, pre_obs(obs))

    state = init_loop(params, cfg, loop_cfg, jax.random.key(0), N_ENVS,
                      stack)
    run = jax.jit(partial(chunk, params=params, cfg=cfg, loop_cfg=loop_cfg,
                          encoder_apply=encoder_apply, n_steps=STEPS,
                          stack=stack))
    state, out = run(state)
    float(np.asarray(out["reward"]).sum())  # warm + fill buffer
    for _ in range(3):
        state, out = run(state)
    float(np.asarray(out["reward"]).sum())
    with jax.profiler.trace(trace_dir):
        state, out = run(state)
        float(np.asarray(out["reward"]).sum())

    traces = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(traces[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            lane = names.get((e.get("pid"), e.get("tid")), "?")
            if lane == "XLA Ops":
                agg[e.get("name", "?")[:70]] += e["dur"]
    print(f"device time per loop step ({STEPS}-step chunk, {N_ENVS} envs):")
    other = 0.0
    for name, dur in agg.most_common():
        ms = dur / 1e3 / STEPS
        if ms >= 0.02 and not name.startswith("while"):
            print(f"  {ms:7.3f} ms  {name}")
        elif not name.startswith("while"):
            other += ms
    print(f"  {other:7.3f} ms  (everything under 0.02 ms/step)")
    total = next((d for n, d in agg.items() if n.startswith("while")), 0)
    print(f"  total device: {total / 1e3 / STEPS:.3f} ms/step "
          f"(= {N_ENVS * STEPS / (total / 1e6):,.0f} env-steps/s)")


if __name__ == "__main__":
    main()
