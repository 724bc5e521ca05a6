"""Fused-step stage ablation on the real chip (honest protocol).

bench.py's rollout body = render (projection -> compaction -> kernel)
+ Stanley + vector.step (car kinematics + local path + info +
auto-reset). Standalone stage timings mislead (each pays its own
dispatch floor and XLA fuses across stages), so this measures the FUSED
scan with stages progressively enabled:

  car    : vector.step only (no obs), checksum on cte
  proj   : + packed projection, checksum on projected coords
  comp   : + compaction (no kernel), checksum on soa
  full   : + rasterize kernel (the bench.py body)

Usage: python benchmarks/step_decomp.py [car proj comp full]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
ITERS = 30
H, W, THICK, GRAN, MAXVIS = 128, 160, 2, 8, 128

CONFIG = {
    "sim": {"fps": 30, "observation_space_format": "classes"},
    "car": {"wheelbase": 0.0487, "track_width": 0.027,
            "max_velocity": 0.15, "max_steering_angle": 30,
            "steering_speed": 30, "max_acceleration": 0.1,
            "max_deceleration": 1.0},
    "camera": {"position": [0.0, -0.005, 0.04], "orientation": [22, 0, 0],
               "resolution": [H, W], "fov": 80, "max_range": 0.5,
               "line_thickness": THICK},
    "map": {"json_path": os.path.join(
        REPO, "examples/maps/simple_layout.json"),
        "pixel_per_meter": 450},
}
SPEED, K = 0.5, 5.0


def main():
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.ops import rasterize_pallas as rp
    from tinycarlo_tpu.train.stanley import stanley_steering

    modes = sys.argv[1:] or ["car", "proj", "comp", "full"]
    params = fenv.make_env_params(CONFIG)
    max_steer = params.cfg.car.max_steering_angle
    md = params.map_data
    e = md.packed_edges.shape[-2]
    nxb = rp._n_xblocks(W)
    k = min(MAXVIS * nxb, e * nxb)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def rollout(vstate, info, mode):
        # finer car-path modes: kin = bicycle kinematics + local-path walk
        # only; kininfo = + car_info (the O(E) laneline scans); car = the
        # full vector.step (+ shaping, counters, auto-reset)
        if mode in ("kin", "kininfo"):
            from tinycarlo_tpu import car as car_mod

            def body(carry, _):
                env_state, checksum = carry
                steering = jnp.full((N_ENVS,), 0.05, jnp.float32)
                new_car, trunc = jax.vmap(
                    lambda cs, st: car_mod.car_step(
                        params.map_data, params.cfg.car, params.cfg.sim.T,
                        cs, jnp.float32(SPEED), st, jnp.int32(0), False,
                    )
                )(env_state.car, steering)
                env_state = env_state.replace(car=new_car)
                checksum = checksum + jnp.sum(
                    jnp.abs(env_state.car.position)).astype(jnp.uint32)
                if mode == "kininfo":
                    info = jax.vmap(
                        lambda cs: car_mod.car_info(
                            params.map_data, params.cfg.car, cs)
                    )(env_state.car)
                    checksum = checksum + jnp.sum(
                        jnp.abs(info["cte"])).astype(jnp.uint32)
                return (env_state, checksum), None

            (env_state, checksum), _ = jax.lax.scan(
                body, (vstate.env, jnp.zeros((), jnp.uint32)), None,
                length=ITERS)
            return vstate, info, checksum

        def body(carry, _):
            vstate, info, checksum = carry
            if mode == "bench":
                obs = fenv.render_observation_batch(params, vstate.env)
                checksum = checksum + jnp.sum(obs, dtype=jnp.uint32)
            elif mode != "car":
                p0, p1, draw = fenv._project_packed_batch(params, vstate.env)
                if mode == "proj":
                    checksum = checksum + jnp.sum(
                        jnp.abs(jnp.where(draw[..., None], p0, 0.0))
                    ).astype(jnp.uint32)
                else:
                    soa = rp.compact_env_idx(
                        p0[:, None], p1[:, None], draw[:, None], k, GRAN,
                        H, THICK, edge_layer=md.packed_edge_layer,
                        n_layers=md.n_layers, w=W)
                    if mode == "comp":
                        checksum = checksum + sum(
                            jnp.sum(x.astype(jnp.float32)) for x in soa
                        ).astype(jnp.uint32)
                    else:
                        obs = rp.rasterize_env_idx(
                            soa, md.n_layers, (H, W), THICK, gran=GRAN,
                            split=True)
                        checksum = checksum + jnp.sum(obs, dtype=jnp.uint32)
            steering = jnp.clip(
                stanley_steering(info["cte"], info["heading_error"],
                                 SPEED, K, max_steer), -1.0, 1.0)
            action = {
                "car_control": jnp.stack(
                    [jnp.full((N_ENVS,), SPEED, jnp.float32),
                     steering.astype(jnp.float32)], axis=-1),
                "maneuver": jnp.zeros((N_ENVS,), jnp.int32),
            }
            vstate, _, rew, term, trunc, info = vector.step(
                params, vstate, action, render=False,
                max_episode_steps=1000)
            checksum = checksum + jnp.sum(
                jnp.abs(info["cte"])).astype(jnp.uint32)
            return (vstate, info, checksum), None

        (vstate, info, checksum), _ = jax.lax.scan(
            body, (vstate, info, jnp.zeros((), jnp.uint32)), None,
            length=ITERS)
        return vstate, info, checksum

    @jax.jit
    def make_inputs(key):
        vstate, _ = vector.reset(params, key, N_ENVS, render=False)
        info = jax.vmap(lambda s: fenv._info(params, s))(vstate.env)
        return vstate, info

    # Prebuild every rep's (distinct) inputs in ONE jitted call each and
    # sync them BEFORE timing: building them eagerly per rep poisons the
    # measurement with hundreds of tunnel dispatches.
    inputs = [
        jax.block_until_ready(make_inputs(jax.random.key(r)))
        for r in range(6)
    ]
    for mode in modes:
        v, inf, c = rollout(*inputs[0], mode)
        int(np.asarray(c))  # warm + load
        ts = []
        for rep in range(1, 6):
            t0 = time.perf_counter()
            v, inf, c = rollout(*inputs[rep], mode)
            int(np.asarray(c))
            ts.append((time.perf_counter() - t0) / ITERS * 1e3)
        print(f"{mode}: med {sorted(ts)[2]:.2f} ms/step  (all: "
              + " ".join(f"{t:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
