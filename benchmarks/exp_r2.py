"""Round-2 rasterizer experiments on the real chip (honest protocol).

Compares the production packed path (compact_env_soa one-hot routing +
env-merged split kernel) against the index-indirection compaction and
multi-env grid packing, at the realistic 4096-env simple_layout
workload. See docs/KERNELS.md "Honest measurement protocol" for why the
timing loop is a jitted scan ending on a forced host transfer.

Usage: python benchmarks/exp_r2.py [mode ...]
Modes: cur curc idx idxc idxg2 idxg4 idxg8 idxg16  (default: all)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W, THICK, GRAN = 128, 160, 2, int(__import__("os").environ.get("GRAN", 16))
ONETIER = bool(int(__import__("os").environ.get("ONETIER", 0)))
MAXVIS = 128
ITERS = 30
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
CACHE = f"/tmp/exp_r2_packed_{N_ENVS}.npz"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_packed():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["p0"], z["p1"], z["draw"], z["lay"], int(z["nl"])
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
    p0, p1, draw = (np.asarray(x) for x in jax.jit(
        fenv._project_packed_batch)(params, vstate.env))
    lay = np.asarray(params.map_data.packed_edge_layer)
    nl = params.map_data.n_layers
    np.savez(CACHE, p0=p0, p1=p1, draw=draw, lay=lay, nl=nl)
    return p0, p1, draw, lay, nl


def main():
    from tinycarlo_tpu.ops import rasterize_pallas as rp

    modes = sys.argv[1:] or ["cur", "curc", "idx", "idxc", "idxg2",
                             "idxg4", "idxg8", "idxg16"]
    p0np, p1np, drawnp, laynp, nl = load_packed()
    if os.environ.get("EMPTY"):
        drawnp = np.zeros_like(drawnp)
    elif os.environ.get("ONESEG"):
        # exactly one short in-frame segment per env: isolates the
        # per-env fixed cost (scratch zero + uint8 convert) from the
        # per-window marginal cost
        drawnp = np.zeros_like(drawnp)
        drawnp[:, 0] = True
        p0np[:, 0] = [40.0, 60.0]
        p1np[:, 0] = [50.0, 61.0]
    e = p0np.shape[1]
    nxb = rp._n_xblocks(W)
    k = min(MAXVIS * nxb, e * nxb)
    lay = jnp.asarray(laynp)
    p1 = jnp.asarray(p1np)
    draw = jnp.asarray(drawnp)
    live = drawnp.sum(-1)
    print(f"packed batch {p0np.shape}: {live.mean():.1f} live edges/env, "
          f"k={k} (nxb={nxb}), modes={modes}")

    @functools.partial(jax.jit, static_argnames=("mode", "iters"))
    def loop(p0, p1, draw, mode, iters):
        def body(c, i):
            a, b = (p0 + i * 0.001)[:, None], (p1 + i * 0.001)[:, None]
            d = draw[:, None]
            if mode.startswith("seg"):
                # segment-axis compaction + in-kernel block expansion
                soa = rp.compact_env_seg(
                    a[..., 0], a[..., 1], b[..., 0], b[..., 1], d,
                    min(MAXVIS, e), GRAN, H, THICK,
                    edge_layer=lay, n_layers=nl, w=W)
                if mode == "segc":
                    s = sum(jnp.sum(x.astype(jnp.float32)) for x in soa)
                    return c + s.astype(jnp.uint32), None
                out = rp.rasterize_env_seg(
                    soa, nl, (H, W), THICK, gran=GRAN, split=True)
            elif mode.startswith("idx"):
                soa = rp.compact_env_idx(
                    a, b, d, k, GRAN, H, THICK,
                    edge_layer=lay, n_layers=nl, w=W, one_tier=ONETIER)
                if mode == "idxc":
                    s = sum(jnp.sum(x.astype(jnp.float32)) for x in soa)
                    return c + s.astype(jnp.uint32), None
                if mode.startswith("idxdma"):
                    g, nb = (int(x) for x in (mode[6:] or "8.3").split("."))
                    out = rp.rasterize_env_dma(
                        soa, nl, (H, W), THICK, gran=GRAN, split=True,
                        group=g, nbuf=nb)
                else:
                    g = int(mode[4:]) if len(mode) > 3 else 1
                    out = rp.rasterize_env_idx(
                        soa, nl, (H, W), THICK, gran=GRAN, split=True,
                        group=g, one_tier=ONETIER)
            else:
                soa = rp.compact_env_soa(
                    a, b, d, k, GRAN, H, THICK,
                    edge_layer=lay, n_layers=nl, w=W)
                if mode == "curc":
                    s = sum(jnp.sum(x.astype(jnp.float32)) for x in soa)
                    return c + s.astype(jnp.uint32), None
                out = rp.rasterize_compact_env_soa(
                    soa, nl, (H, W), THICK, gran=GRAN, split=True)
            return c + jnp.sum(out.astype(jnp.uint32)), None

        return jax.lax.scan(
            body, jnp.uint32(0), jnp.arange(iters, dtype=jnp.float32))[0]

    # kernel-only / DMA-floor modes: soa precomputed once, scan runs only
    # the kernel (perturbing ax per iter so nothing is loop-invariant)
    if any(m.startswith(("ko", "dma", "ovl", "dskip")) for m in modes):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        soa0 = jax.block_until_ready(rp.compact_env_idx(
            jnp.asarray(p0np)[:, None], p1[:, None], draw[:, None],
            k, GRAN, H, THICK, edge_layer=lay, n_layers=nl, w=W,
            one_tier=ONETIER))

        @functools.partial(jax.jit, static_argnames=("mode", "iters"))
        def loop_ko(soa, shift, mode, iters):
            def body(c, i):
                if mode.startswith("ovl"):
                    # overlap probe: KK rounds of dummy vector FMA per
                    # instance + the same uint8 out-block write. If grid
                    # pipelining overlaps compute with the out DMA, time
                    # ~= max(dma-floor, compute); if serialized, the sum.
                    KK = int(mode[3:])

                    def okernel(i_ref, o_ref, sc):
                        v = i_ref[0]
                        sc[:] = jnp.full((128, 128), v.astype(jnp.float32))

                        def fma(_, x):
                            return x * 1.000001 + 0.0001

                        acc = jax.lax.fori_loop(
                            0, KK, fma, sc[:])
                        sc[:] = acc
                        u = sc[0, 0].astype(jnp.int32).astype(jnp.uint8)
                        for l in range(nl):
                            o_ref[0, l] = jnp.full((H, W), u)

                    out = pl.pallas_call(
                        okernel,
                        grid=(N_ENVS,),
                        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                        out_specs=pl.BlockSpec(
                            (1, nl, H, W), lambda ii: (ii, 0, 0, 0)),
                        out_shape=jax.ShapeDtypeStruct(
                            (N_ENVS, nl, H, W), jnp.uint8),
                        scratch_shapes=[
                            pltpu.VMEM((128, 128), jnp.float32)],
                    )(i.astype(jnp.float32).reshape(1))
                elif mode.startswith("dma"):
                    suffix = mode[3:]
                    if suffix.startswith("flat"):
                        # lane-aligned contiguous layout: is the 3 ms
                        # floor the 160-lane masked-store/padded-DMA tax?
                        # optional group suffix (flat16) amortizes
                        # per-instance mechanics to separate them from
                        # store/DMA byte costs
                        g = int(suffix[4:]) if suffix[4:] else 1
                        rows = nl * H * W // 128

                        def zkernel(i_ref, o_ref):
                            for gg in range(g):
                                o_ref[gg] = jnp.full((rows, 128), i_ref[0])

                        out = pl.pallas_call(
                            zkernel,
                            grid=(N_ENVS // g,),
                            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                            out_specs=pl.BlockSpec(
                                (g, rows, 128), lambda ii: (ii, 0, 0)),
                            out_shape=jax.ShapeDtypeStruct(
                                (N_ENVS, rows, 128), jnp.uint8),
                        )(i.astype(jnp.uint8).reshape(1))
                    elif suffix == "f32":
                        def zkernel(i_ref, o_ref):
                            for l in range(nl):
                                o_ref[0, l] = jnp.full((H, W), i_ref[0])

                        out = pl.pallas_call(
                            zkernel,
                            grid=(N_ENVS,),
                            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                            out_specs=pl.BlockSpec(
                                (1, nl, H, W), lambda ii: (ii, 0, 0, 0)),
                            out_shape=jax.ShapeDtypeStruct(
                                (N_ENVS, nl, H, W), jnp.float32),
                        )(i.astype(jnp.float32).reshape(1))
                        return c + jnp.sum(out[0, 0, 0, :4]).astype(
                            jnp.uint32), None
                    else:
                        g = int(suffix) if suffix else 1

                        def zkernel(i_ref, o_ref):
                            v = i_ref[0]
                            for gg in range(g):
                                for l in range(nl):
                                    o_ref[gg, l] = jnp.full((H, W), v)

                        out = pl.pallas_call(
                            zkernel,
                            grid=(N_ENVS // g,),
                            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                            out_specs=pl.BlockSpec(
                                (g, nl, H, W), lambda ii: (ii, 0, 0, 0)),
                            out_shape=jax.ShapeDtypeStruct(
                                (N_ENVS, nl, H, W), jnp.uint8),
                        )(i.astype(jnp.uint8).reshape(1))
                elif mode.startswith("dskip"):
                    # Per-(env, layer) conditional-DMA floor probe: only
                    # frames live in the REAL workload are staged and
                    # DMA'd (the temporal-aliasing skip's steady state);
                    # "dskipall" forces every frame live (pure per-frame
                    # DMA issue-overhead ceiling vs the slab `dma` mode).
                    # Frame addressing is flattened to one leading dim
                    # (multi-index memref slices fault the DMA engine).
                    nbuf = 3
                    wp = 256
                    livem = (
                        np.ones((nl, N_ENVS), np.int32)
                        if mode == "dskipall"
                        else np.stack(
                            [
                                (drawnp & (laynp[None] == l)).any(1)
                                for l in range(nl)
                            ]
                        ).astype(np.int32)
                    )
                    livej = jnp.asarray(livem)

                    def dkernel(live_ref, i_ref, o_ref, st, sems):
                        ii = jnp.asarray(pl.program_id(0), jnp.int32)
                        buf = jax.lax.rem(ii, jnp.int32(nbuf))

                        def cp(inst, q, l):
                            return pltpu.make_async_copy(
                                st.at[q * nl + l],
                                o_ref.at[inst * nl + l],
                                sems.at[q * nl + l],
                            )

                        for l in range(nl):
                            @pl.when((ii >= nbuf)
                                     & (live_ref[l, ii - nbuf] > 0))
                            def _reclaim(l=l):
                                cp(ii - nbuf, buf, l).wait()

                        for l in range(nl):
                            @pl.when(live_ref[l, ii] > 0)
                            def _emit(l=l):
                                st[buf * nl + l] = jnp.full(
                                    (H, wp), i_ref[0], jnp.uint8
                                )
                                cp(ii, buf, l).start()

                        for d in range(nbuf):
                            for l in range(nl):
                                @pl.when(
                                    (ii == N_ENVS - 1) & (ii >= d)
                                    & (live_ref[l, ii - d] > 0)
                                )
                                def _drain(d=d, l=l):
                                    cp(
                                        ii - d,
                                        jax.lax.rem(
                                            ii - d, jnp.int32(nbuf)
                                        ),
                                        l,
                                    ).wait()

                    out = pl.pallas_call(
                        dkernel,
                        grid_spec=pltpu.PrefetchScalarGridSpec(
                            num_scalar_prefetch=1,
                            grid=(N_ENVS,),
                            in_specs=[
                                pl.BlockSpec(memory_space=pltpu.SMEM)
                            ],
                            out_specs=pl.BlockSpec(
                                memory_space=pltpu.ANY
                            ),
                            scratch_shapes=[
                                pltpu.VMEM(
                                    (nbuf * nl, H, wp), jnp.uint8
                                ),
                                pltpu.SemaphoreType.DMA((nbuf * nl,)),
                            ],
                        ),
                        out_shape=jax.ShapeDtypeStruct(
                            (N_ENVS * nl, H, wp), jnp.uint8
                        ),
                    )(livej, i.astype(jnp.uint8).reshape(1))
                    # contiguous sample (a strided ::16 gather makes XLA
                    # relayout-copy the whole 640 MB buffer -> OOM)
                    return c + jnp.sum(
                        out[:, 60:64, :].astype(jnp.uint32)
                    ), None
                elif mode.startswith("kodma"):
                    g, nb = (int(x) for x in (mode[5:] or "8.3").split("."))
                    idx0, ax0, *rest = soa
                    out = rp.rasterize_env_dma(
                        (idx0, ax0 + shift + i * 1e-4, *rest), nl, (H, W),
                        THICK, gran=GRAN, split=True, group=g, nbuf=nb)
                else:
                    g = int(mode[2:]) if len(mode) > 2 else 1
                    idx0, ax0, *rest = soa
                    out = rp.rasterize_env_idx(
                        (idx0, ax0 + shift + i * 1e-4, *rest), nl, (H, W),
                        THICK, gran=GRAN, split=True, group=g,
                        one_tier=ONETIER)
                return c + jnp.sum(out.astype(jnp.uint32)), None

            return jax.lax.scan(
                body, jnp.uint32(0),
                jnp.arange(iters, dtype=jnp.float32))[0]

        for mode in [m for m in modes if m.startswith(("ko", "dma", "ovl", "dskip"))]:
            int(np.asarray(loop_ko(soa0, jnp.float32(0), mode, ITERS)))
            ts = []
            for rep in range(1, 6):
                t0 = time.perf_counter()
                int(np.asarray(
                    loop_ko(soa0, jnp.float32(rep * 0.01), mode, ITERS)))
                ts.append((time.perf_counter() - t0) / ITERS * 1e3)
            print(f"{mode}: med {sorted(ts)[2]:.2f} ms/iter  (all: "
                  + " ".join(f"{t:.2f}" for t in ts) + ")")
        modes = [m for m in modes if not m.startswith(("ko", "dma", "ovl", "dskip"))]

    shifts = [jnp.asarray(p0np + 0.01 * s) for s in range(7)]
    for mode in modes:
        ref = int(np.asarray(loop(shifts[0], p1, draw, mode, ITERS)))
        ts = []
        for rep in range(1, 6):
            t0 = time.perf_counter()
            int(np.asarray(loop(shifts[rep], p1, draw, mode, ITERS)))
            ts.append((time.perf_counter() - t0) / ITERS * 1e3)
        print(f"{mode}: med {sorted(ts)[2]:.2f} ms/iter  (all: "
              + " ".join(f"{t:.2f}" for t in ts) + f") checksum {ref}")


if __name__ == "__main__":
    main()
