"""Device-timeline profile of the fused production step.

jax.profiler works through the tunneled TPU backend (verified round 2):
this traces N fused steps at the reference 4096-env workload, then mines
the xplane trace for per-op device time -- the ground truth the ablation
timings in step_decomp.py approximate.

Round-2 snapshot (10 steps, device lane):
  rasterize_env_idx   4.90 ms/step   (kernel compute; its output DMA
                                      overlaps the following fusions)
  convert_reduce      0.89 ms/step   (the benchmark's obs checksum)
  sort (top_k)        0.55 ms/step   (compaction index selection)
  ~60 small fusions   1.9  ms/step   (projection, car, shaping, reset)
  total device        8.23 ms/step   (wall 9.4 incl. dispatch)

Usage: python benchmarks/profile_step.py [trace_dir]
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
STEPS = 10


def main():
    import dataclasses

    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tinycarlo_trace"
    params = fenv.make_env_params(
        os.path.join(REPO, "examples/config_simple_layout.yaml")
    )
    params = params.replace(cfg=dataclasses.replace(
        params.cfg, sim=dataclasses.replace(
            params.cfg.sim, observation_space_format="classes")))
    vstate, _ = vector.reset(params, jax.random.key(0), N_ENVS, render=False)

    @jax.jit
    def run(vstate):
        def body(carry, _):
            vstate, c = carry
            obs = fenv.render_observation_batch(params, vstate.env)
            c = c + jnp.sum(obs, dtype=jnp.uint32)
            action = {
                "car_control": jnp.tile(
                    jnp.asarray([0.5, 0.05], jnp.float32), (N_ENVS, 1)),
                "maneuver": jnp.zeros((N_ENVS,), jnp.int32),
            }
            vstate, _, _, _, _, _ = vector.step(
                params, vstate, action, render=False,
                max_episode_steps=1000)
            return (vstate, c), None

        (vstate, c), _ = jax.lax.scan(
            body, (vstate, jnp.zeros((), jnp.uint32)), None, length=STEPS)
        return vstate, c

    vstate, c = run(vstate)
    int(np.asarray(c))  # warm
    with jax.profiler.trace(trace_dir):
        vstate, c = run(vstate)
        int(np.asarray(c))

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
                agg[e.get("name", "?")[:60]] += e["dur"]
    print(f"device time per step ({STEPS}-step scan, {N_ENVS} envs):")
    other = 0.0
    for name, dur in agg.most_common():
        ms = dur / 1e3 / STEPS
        if ms >= 0.05 and not name.startswith("while"):
            print(f"  {ms:7.3f} ms  {name}")
        elif not name.startswith("while"):
            other += ms
    print(f"  {other:7.3f} ms  (everything under 0.05 ms/step)")
    total = next((d for n, d in agg.items() if n.startswith("while")), 0)
    print(f"  total device: {total / 1e3 / STEPS:.3f} ms/step")


if __name__ == "__main__":
    main()
