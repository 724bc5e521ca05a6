"""Headline benchmark: env-steps/s/chip at 4096 parallel envs, classes obs.

BASELINE.json config 2: simple_layout map, Stanley controller, CTE reward,
128x160 5-class observations rendered every step. The reference publishes
no numbers (BASELINE.md), so `vs_baseline` compares against the reference
implementation measured live on this host (single env, same config, same
controller, no human rendering) -- the only throughput the reference can
deliver. When /root/reference is not mounted, the last recorded reference
number is used and flagged.

Timing: one jitted CHUNK-step scan per repeat, chained vstate -> vstate so
every dispatch sees distinct inputs (the tunneled TPU backend memoizes
identical dispatches), each repeat ended by a forced host transfer of the
scan's checksum (block_until_ready under-waits on the tunnel). Reports the
median of REPEATS>=5 with min/max spread (docs/KERNELS.md honest protocol).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"
# measured on this host, round 1 (BASELINE.md); used when the reference
# checkout is absent
RECORDED_REFERENCE_SPS = 132.8
CONFIG = {
    # examples/config_simple_layout.yaml with classes obs and no
    # human-render machinery (maps vendored, examples/maps/README.md).
    # BENCH_OBS_FORMAT=rgb measures the rgb rank-kernel path instead
    # (the headline metric stays classes).
    "sim": {"fps": 30, "observation_space_format":
            os.environ.get("BENCH_OBS_FORMAT", "classes")},
    "car": {
        "wheelbase": 0.0487,
        "track_width": 0.027,
        "max_velocity": 0.15,
        "max_steering_angle": 30,
        "steering_speed": 30,
        "max_acceleration": 0.1,
        "max_deceleration": 1.0,
    },
    "camera": {
        "position": [0.0, -0.005, 0.04],
        "orientation": [22, 0, 0],
        "resolution": [128, 160],
        "fov": 80,
        "max_range": 0.5,
        "line_thickness": 2,
    },
    "map": {
        "json_path": os.path.join(REPO, "examples/maps/simple_layout.json"),
        "pixel_per_meter": 450,
    },
}
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
CHUNK = int(os.environ.get("BENCH_CHUNK", 400))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
UNROLL = int(os.environ.get("BENCH_UNROLL", 8))
SPEED, K = 0.5, 5.0


def measure_ours():
    import jax
    import jax.numpy as jnp

    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.train.stanley import stanley_steering

    params = fenv.make_env_params(CONFIG)
    max_steer = params.cfg.car.max_steering_angle

    def body(carry, _):
        vstate, info, checksum = carry
        obs = fenv.render_observation_batch(params, vstate.env)
        # consume the rendered observation so it cannot be dead-code
        # eliminated. A small CONTIGUOUS sample is enough: XLA keeps or
        # drops the rasterizer call as a whole (the full obs buffer is
        # written either way), while a full-buffer reduction re-reads
        # all 419 MB -- 0.89 ms/step of pure measurement overhead on top
        # of the product step (benchmarks/profile_step.py round-2
        # trace). Strided sampling (::16) is NOT safe here: XLA lowers
        # it to a relayout copy of the whole buffer with the gather dims
        # minor (measured 25x padding expansion -> OOM).
        checksum = checksum + jnp.sum(
            obs[..., 60:64, :], dtype=jnp.uint32
        )
        steering = jnp.clip(
            stanley_steering(
                info["cte"], info["heading_error"], SPEED, K, max_steer
            ),
            -1.0,
            1.0,
        )
        action = {
            "car_control": jnp.stack(
                [jnp.full((N_ENVS,), SPEED, jnp.float32),
                 steering.astype(jnp.float32)],
                axis=-1,
            ),
            "maneuver": jnp.zeros((N_ENVS,), jnp.int32),
        }
        vstate, _, rew, term, trunc, info = vector.step(
            params, vstate, action, render=False, max_episode_steps=1000
        )
        return (vstate, info, checksum), rew[0]

    @jax.jit
    def rollout(vstate, info):
        # unroll: lets XLA overlap one step's rasterize-kernel output
        # DMA with the next step's car/info fusions (unroll=4 +3.7%,
        # benchmarks/exp_r3c.py; unroll=8 a further +0.7% at CHUNK=400,
        # non-overlapping spreads). CHUNK=400: the tunneled backend costs
        # ~16 ms fixed per rollout dispatch (two-point fit 508.8k@50 /
        # 524.5k@200 same window), so short chunks under-report the chip:
        # 50->400 steps/dispatch is +3.8% with identical per-step work.
        (vstate, info, checksum), rews = jax.lax.scan(
            body, (vstate, info, jnp.zeros((), jnp.uint32)), None,
            length=CHUNK, unroll=UNROLL,
        )
        return vstate, info, checksum, rews

    vstate, _ = vector.reset(params, jax.random.key(0), N_ENVS, render=False)
    # segment-budget guard: the benchmark must not be "fast" by silently
    # dropping visible segments (env.check_segment_overflow docstring)
    overflow = int(
        jnp.sum(jax.jit(fenv.check_segment_overflow)(params, vstate.env))
    )
    assert overflow == 0, (
        f"{overflow} rasterizer slot copies dropped -- raise "
        "CameraConfig.max_visible_segments"
    )
    info = jax.vmap(lambda s: fenv._info(params, s))(vstate.env)
    vstate, info, checksum, _ = jax.block_until_ready(
        rollout(vstate, info)
    )
    assert int(checksum) > 0, "observations were not rendered"
    rates = []
    for _ in range(max(REPEATS, 5)):
        st = time.perf_counter()
        vstate, info, checksum, _ = rollout(vstate, info)
        # forced host transfer: the tunneled backend can resolve
        # block_until_ready before execution completes
        assert int(checksum) > 0
        rates.append(N_ENVS * CHUNK / (time.perf_counter() - st))
    rates.sort()
    return rates[len(rates) // 2], rates[0], rates[-1]


def measure_reference(steps: int = 300):
    """Single-env reference steps/s with classes obs + Stanley control."""
    if not os.path.isdir(os.path.join(REFERENCE, "tinycarlo")):
        return None
    sys.path.insert(0, REFERENCE)
    import numpy as np
    from tinycarlo.env import TinyCarloEnv

    cfg = dict(CONFIG)
    cfg["map"] = dict(
        CONFIG["map"],
        json_path=os.path.join(
            REFERENCE, "examples/maps/simple_layout.json"
        ),
    )
    env = TinyCarloEnv(config=cfg)
    _, info = env.reset(seed=0)
    st = time.perf_counter()
    done_steps = 0
    for _ in range(steps):
        steering = float(
            np.clip(
                (info["heading_error"] + math.atan2(K * info["cte"], SPEED))
                * 180.0
                / math.pi
                / env.car.max_steering_angle,
                -1,
                1,
            )
        )
        _, _, term, trunc, info = env.step(
            {"car_control": [SPEED, steering], "maneuver": 0}
        )
        done_steps += 1
        if term or trunc:
            _, info = env.reset()
    return done_steps / (time.perf_counter() - st)


def main():
    ref_sps = measure_reference()
    ref_live = ref_sps is not None
    if not ref_live:
        ref_sps = RECORDED_REFERENCE_SPS
    med, lo, hi = measure_ours()
    # The recorded reference number was measured with classes obs; for a
    # non-default BENCH_OBS_FORMAT without a live reference measurement
    # the ratio would compare mismatched formats -- flag it null.
    fmt = CONFIG["sim"]["observation_space_format"]
    comparable = ref_live or fmt == "classes"
    print(
        json.dumps(
            {
                "metric": f"env-steps/s/chip at {N_ENVS} envs "
                          f"({CONFIG['sim']['observation_space_format']}"
                          " obs, Stanley)",
                "value": round(med, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(med / ref_sps, 2) if comparable
                else None,
                "baseline_reference_steps_per_s": round(ref_sps, 1),
                "baseline_measured_live": ref_live,
                "spread_min": round(lo, 1),
                "spread_max": round(hi, 1),
                "repeats": max(REPEATS, 5),
                "n_envs": N_ENVS,
            }
        )
    )


if __name__ == "__main__":
    main()
