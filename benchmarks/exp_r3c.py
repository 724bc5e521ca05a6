"""Round-3 headline-throughput probes on the real chip (honest protocol).

Probes, selected by argv:
  unroll   -- does `lax.scan(..., unroll=N)` let XLA overlap one step's
              rasterize kernel with the next step's car/info fusions?
  fill     -- XLA-native (non-Pallas) store-rate floors for the 419 MB
              uint8 obs and the f32 equivalent: is the ~200 GB/s uint8
              rate a Mosaic property or a chip/DMA property?
  geom     -- window-geometry re-sweep at the new split stroke
              (gran/win/unroll via env, kernel-only timing).

Usage: python benchmarks/exp_r3c.py [unroll fill geom]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
CHUNK = 30


def _config():
    return {
        "sim": {"fps": 30, "observation_space_format": "classes"},
        "car": {"wheelbase": 0.0487, "track_width": 0.027,
                "max_velocity": 0.15, "max_steering_angle": 30,
                "steering_speed": 30, "max_acceleration": 0.1,
                "max_deceleration": 1.0},
        "camera": {"position": [0.0, -0.005, 0.04],
                   "orientation": [22, 0, 0], "resolution": [128, 160],
                   "fov": 80, "max_range": 0.5, "line_thickness": 2},
        "map": {"json_path": os.path.join(
            REPO, "examples/maps/simple_layout.json"),
            "pixel_per_meter": 450},
    }


def _median_ms(fn, state, n=5):
    """fn(state) -> (state', checksum); chained, forced-transfer timing."""
    state, checksum = fn(state)
    assert int(checksum) != 0 or True
    times = []
    for _ in range(n):
        st = time.perf_counter()
        state, checksum = fn(state)
        int(np.asarray(checksum))
        times.append((time.perf_counter() - st) * 1000)
    times.sort()
    return times[len(times) // 2], state


def probe_unroll():
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.train.stanley import stanley_steering

    params = fenv.make_env_params(_config())
    max_steer = params.cfg.car.max_steering_angle

    def body(carry, _):
        vstate, info, checksum = carry
        obs = fenv.render_observation_batch(params, vstate.env)
        checksum = checksum + jnp.sum(obs[:, :, 60:64, :], dtype=jnp.uint32)
        steering = jnp.clip(
            stanley_steering(info["cte"], info["heading_error"], 0.5, 5.0,
                             max_steer), -1.0, 1.0)
        action = {
            "car_control": jnp.stack(
                [jnp.full((N_ENVS,), 0.5, jnp.float32),
                 steering.astype(jnp.float32)], axis=-1),
            "maneuver": jnp.zeros((N_ENVS,), jnp.int32),
        }
        vstate, _, _, _, _, info = vector.step(
            params, vstate, action, render=False, max_episode_steps=1000)
        return (vstate, info, checksum), None

    vstate, _ = vector.reset(params, jax.random.key(0), N_ENVS, render=False)
    info = jax.vmap(lambda s: fenv._info(params, s))(vstate.env)

    for unroll in (1, 2, 4):
        @jax.jit
        def roll(carry, unroll=unroll):
            vstate, info = carry
            (vstate, info, checksum), _ = jax.lax.scan(
                body, (vstate, info, jnp.zeros((), jnp.uint32)), None,
                length=CHUNK, unroll=unroll)
            return (vstate, info), checksum

        ms, _ = _median_ms(roll, (vstate, info))
        sps = N_ENVS * CHUNK / (ms / 1000)
        print(f"unroll={unroll}: {ms/CHUNK:.3f} ms/step = {sps:,.0f} env-steps/s")


def probe_fill():
    """Materialization is forced by carrying the written buffer through
    the scan (a slice-reduction of jnp.full constant-folds -- the first
    version of this probe measured nothing)."""
    shape_u8 = (N_ENVS, 5, 128, 160)
    nbytes = int(np.prod(shape_u8))

    def timed(name, fn, dtype, mult):
        @jax.jit
        def roll(carry):
            def body(c, _):
                i, _ = c
                return (i + jnp.uint8(1), fn(i)), None
            (i, buf), _ = jax.lax.scan(body, carry, None, length=CHUNK)
            return (i, buf), jnp.sum(buf[:, :, 60:64, :], dtype=jnp.uint32)

        init = (jnp.uint8(1), jnp.zeros(shape_u8, dtype))
        st_state = init
        (st_state, checksum) = roll(st_state)
        int(np.asarray(checksum))
        times = []
        for _ in range(5):
            st = time.perf_counter()
            st_state, checksum = roll(st_state)
            int(np.asarray(checksum))
            times.append((time.perf_counter() - st) * 1000)
        times.sort()
        ms = times[len(times) // 2]
        rate = nbytes * mult / (ms / CHUNK / 1000) / 1e9
        print(f"{name}: {ms/CHUNK:.3f} ms/write = {rate:,.0f} GB/s")

    timed("XLA uint8 full (carried)",
          lambda i: jnp.full(shape_u8, i, jnp.uint8), jnp.uint8, 1)
    timed("XLA uint8 iota+i (carried)",
          lambda i: (jax.lax.broadcasted_iota(jnp.int32, shape_u8, 3)
                     .astype(jnp.uint8) + i), jnp.uint8, 1)
    timed("XLA f32 full (carried)",
          lambda i: jnp.full(shape_u8, i, jnp.float32), jnp.float32, 4)


def probe_geom():
    # kernel-only timing at the production workload, current defaults
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.ops import rasterize_pallas as rp

    params = fenv.make_env_params(_config())
    vstate, _ = vector.reset(params, jax.random.key(0), N_ENVS, render=False)
    u0, v0, u1, v1, draw = jax.jit(
        lambda s: fenv._project_packed_batch_soa(params, s)
    )(vstate.env)
    md = params.map_data

    @jax.jit
    def roll(carry):
        i, checksum = carry

        def body(c, _):
            i, checksum = c
            masks = rp.rasterize_masks_packed_pallas_soa(
                u0 + i.astype(jnp.float32) * 1e-6, v0, u1, v1, draw,
                md.packed_edge_layer, md.n_layers, (128, 160), 2,
                max_visible=int(os.environ.get("TINYCARLO_MAXVIS", 128)),
                layer_bounds=md.packed_layer_bounds or None)
            return (i + 1, checksum + jnp.sum(
                masks[:, :, 60:64, :], dtype=jnp.uint32)), None

        (i, checksum), _ = jax.lax.scan(
            body, (i, checksum), None, length=CHUNK)
        return (i, checksum), checksum

    ms, _ = _median_ms(lambda c: roll(c), (jnp.zeros((), jnp.int32),
                                           jnp.zeros((), jnp.uint32)))
    print(f"proj+compact+kernel: {ms/CHUNK:.3f} ms/step "
          f"(gran/win/unroll = env TINYCARLO_*)")


def probe_dma():
    """A/B: production idx kernel vs the manual-DMA variant at current
    code state (split stroke), same compaction."""
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.ops import rasterize_pallas as rp

    params = fenv.make_env_params(_config())
    vstate, _ = vector.reset(params, jax.random.key(0), N_ENVS, render=False)
    u0, v0, u1, v1, draw = jax.jit(
        lambda s: fenv._project_packed_batch_soa(params, s)
    )(vstate.env)
    md = params.map_data
    e = draw.shape[-1]
    nxb = rp._n_xblocks(160)
    k = min(128 * nxb, e * nxb)

    def run_variant(name, raster):
        @jax.jit
        def roll(carry):
            i, checksum = carry

            def body(c, _):
                i, checksum = c
                soa = rp.compact_env_idx_soa(
                    (u0 + i.astype(jnp.float32) * 1e-6).reshape(-1, 1, e),
                    v0.reshape(-1, 1, e), u1.reshape(-1, 1, e),
                    v1.reshape(-1, 1, e), draw.reshape(-1, 1, e),
                    k, 16, 128, 2, edge_layer=md.packed_edge_layer,
                    n_layers=md.n_layers, w=160,
                    layer_bounds=md.packed_layer_bounds or None)
                masks = raster(soa)
                return (i + 1, checksum + jnp.sum(
                    masks[:, :, 60:64, :], dtype=jnp.uint32)), None

            (i, checksum), _ = jax.lax.scan(
                body, (i, checksum), None, length=CHUNK)
            return (i, checksum), checksum

        ms, _ = _median_ms(lambda c: roll(c), (jnp.zeros((), jnp.int32),
                                               jnp.zeros((), jnp.uint32)))
        print(f"{name}: {ms/CHUNK:.3f} ms/step")

    run_variant("idx (production)", lambda soa: rp.rasterize_env_idx(
        soa, md.n_layers, (128, 160), 2, gran=16, split=True))
    for group, nbuf in ((4, 2), (8, 2), (16, 2)):
        run_variant(f"dma g{group} nbuf{nbuf}", lambda soa, g=group, n=nbuf:
                    rp.rasterize_env_dma(soa, md.n_layers, (128, 160), 2,
                                         gran=16, split=True, group=g,
                                         nbuf=n))


if __name__ == "__main__":
    for which in (sys.argv[1:] or ["unroll", "fill"]):
        print(f"== {which} ==", flush=True)
        {"unroll": probe_unroll, "fill": probe_fill,
         "geom": probe_geom, "dma": probe_dma}[which]()
