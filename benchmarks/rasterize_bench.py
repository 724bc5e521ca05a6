"""Honest-protocol microbenchmark for the rasterization path.

Measures `compact_soa` + `rasterize_compact_soa` (and compaction alone)
on the real chip at a realistic workload: segments projected from a
4096-env reset on simple_layout (~5 live segments per (env, layer)
frame, ~54% fully-empty frames).

The tunneled TPU backend breaks the naive per-call timing loop: it
memoizes identical dispatches, `block_until_ready` can return before
execution finishes, and per-dispatch latency is large and variable
(~0.5 s observed). See docs/KERNELS.md "Honest measurement protocol".
This harness therefore:
  * bakes ITERS iterations into one jitted `lax.scan` whose body
    perturbs the input per iteration and reduces the output to a scalar
    carried through the scan;
  * warms the executable once;
  * times repeat calls with DISTINCT input shifts, each ended by a
    forced host transfer (`int(np.asarray(...))`);
  * reports the median of 5 repeats.

Usage:
  python benchmarks/rasterize_bench.py             # compact+kernel
  python benchmarks/rasterize_bench.py compact     # compaction only
  EMPTY=1 python benchmarks/rasterize_bench.py     # empty-frame floor
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W, THICK, K, GRAN = 128, 160, 2, 128, 8
ITERS = 30
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
CACHE = f"/tmp/rasterize_bench_segs_{N_ENVS}.npz"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_segments():
    """(p0, p1, draw) pixel-space segments from a real 4096-env reset."""
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["p0"], z["p1"], z["draw"]
    from tinycarlo_tpu import camera as cam
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector

    config = {
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
    params = fenv.make_env_params(config)
    vstate, _ = vector.reset(params, jax.random.key(0), N_ENVS, render=False)
    md = params.map_data

    @jax.jit
    def project(envstate):
        body = jax.vmap(cam.car_world_to_body_matrix)(
            envstate.car.position, envstate.car.rotation)
        pose = jnp.einsum("ij,bjk->bik", params.camera.E, body)

        def per_env(m):
            return jax.vmap(lambda n, e, msk: cam.project_layer(
                n, e, msk, m, params.camera.K, (H, W),
                params.cfg.camera.max_range))(
                md.laneline_nodes, md.laneline_edges, md.laneline_edge_mask)

        return jax.vmap(per_env)(pose)

    p0, p1, draw = (np.asarray(x) for x in project(vstate.env))
    np.savez(CACHE, p0=p0, p1=p1, draw=draw)
    return p0, p1, draw


def main():
    from tinycarlo_tpu.ops import rasterize_pallas as rp

    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    p0np, p1np, drawnp = load_segments()
    if os.environ.get("EMPTY"):
        drawnp = np.zeros_like(drawnp)
    p1 = jnp.asarray(p1np)
    draw = jnp.asarray(drawnp)
    live = drawnp.sum(-1)
    print(f"batch {p0np.shape}: {live.mean():.2f} live segs/frame, "
          f"{(live == 0).mean() * 100:.1f}% empty frames, mode={mode}")

    nl = p0np.shape[1]

    @functools.partial(jax.jit, static_argnames=("mode", "iters"))
    def loop(p0, p1, draw, mode, iters):
        def body(c, i):
            a, b = p0 + i * 0.001, p1 + i * 0.001
            if mode in ("env", "envcompact"):
                soa = rp.compact_env_soa(a, b, draw, K, GRAN, H, THICK)
                if mode == "envcompact":
                    s = sum(jnp.sum(x.astype(jnp.float32)) for x in soa)
                    return c + s.astype(jnp.uint32), None
                out = rp.rasterize_compact_env_soa(
                    soa, nl, (H, W), THICK, gran=GRAN)
                return c + jnp.sum(out.astype(jnp.uint32)), None
            soa = rp.compact_soa(a, b, draw, K, GRAN, H, THICK)
            if mode == "compact":
                s = sum(jnp.sum(x.astype(jnp.float32)) for x in soa)
                return c + s.astype(jnp.uint32), None
            out = rp.rasterize_compact_soa(soa, (H, W), THICK, gran=GRAN)
            return c + jnp.sum(out.astype(jnp.uint32)), None

        return jax.lax.scan(
            body, jnp.uint32(0), jnp.arange(iters, dtype=jnp.float32))[0]

    shifts = [jnp.asarray(p0np + 0.01 * s) for s in range(6)]
    int(np.asarray(loop(shifts[0], p1, draw, mode, ITERS)))  # warm + load
    ts = []
    for rep in range(1, 6):
        t0 = time.perf_counter()
        int(np.asarray(loop(shifts[rep], p1, draw, mode, ITERS)))
        ts.append((time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{mode}: med {sorted(ts)[2]:.2f} ms/iter  (all: "
          + " ".join(f"{t:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
