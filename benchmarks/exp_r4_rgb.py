"""Round-4 rgb-path probes on the real chip (honest protocol: scan-carried
buffers, forced host transfer, medians of 5 -- docs/KERNELS.md).

The rgb observation (the reference's DEFAULT format, env.py:43) costs
~400k vs classes' ~540k env-steps/s. Its output is a (B, H, W, 3) uint8
HWC frame whose minor dim is 3 -- hostile to the 128-lane store path.
These probes establish the LAYOUT floors so the product number can be
judged against what the chip can do at all:

  fill-hwc     -- bare XLA materialization of the (B,128,160,3) frame
  fill-planar  -- same bytes as (B,3,128,160) (lane-friendly planar)
  fill-rank    -- the (B,128,160) rank map the kernel emits (84 MB)
  comp-hwc     -- rgb_from_rank composite: carried rank -> HWC frame
  comp-planar  -- same composite emitting (B,3,H,W) planar

Usage: python benchmarks/exp_r4_rgb.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
CHUNK = 30
H, W = 128, 160
PALETTE = jnp.asarray(
    [[255, 255, 255], [0, 200, 0], [0, 0, 200], [200, 0, 0], [80, 80, 80]],
    jnp.uint8,
)


def timed(name, shape, fn, checksum_slice, nbytes):
    @jax.jit
    def roll(carry):
        def body(c, _):
            i, _ = c
            return (i + jnp.uint8(1), fn(i)), None

        (i, buf), _ = jax.lax.scan(body, carry, None, length=CHUNK)
        return (i, buf), jnp.sum(checksum_slice(buf), dtype=jnp.uint32)

    init = (jnp.uint8(1), jnp.zeros(shape, jnp.uint8))
    state = init
    state, checksum = roll(state)
    int(np.asarray(checksum))
    times = []
    for _ in range(5):
        st = time.perf_counter()
        state, checksum = roll(state)
        int(np.asarray(checksum))
        times.append((time.perf_counter() - st) * 1000)
    times.sort()
    ms = times[len(times) // 2] / CHUNK
    print(f"{name}: {ms:.3f} ms/step = {nbytes / (ms / 1000) / 1e9:,.0f} GB/s")


def main():
    hwc = (N_ENVS, H, W, 3)
    planar = (N_ENVS, 3, H, W)
    rankshape = (N_ENVS, H, W)
    nb_hwc = int(np.prod(hwc))
    nb_rank = int(np.prod(rankshape))

    timed("fill-hwc   ", hwc, lambda i: jnp.full(hwc, i, jnp.uint8),
          lambda b: b[:, 60:62], nb_hwc)
    timed("fill-planar", planar, lambda i: jnp.full(planar, i, jnp.uint8),
          lambda b: b[:, :, 60:62], nb_hwc)
    timed("fill-rank  ", rankshape, lambda i: jnp.full(rankshape, i, jnp.uint8),
          lambda b: b[:, 60:62], nb_rank)

    # composite probes: carry a rank map, emit the composite each step
    def comp(i, planar_out):
        rank = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.uint8, rankshape, 2) + i,
            jnp.uint8(6),
        )
        frame = jnp.zeros(rankshape + (3,), jnp.uint8)
        for l in range(5):
            frame = jnp.where((rank == l + 1)[..., None], PALETTE[l], frame)
        if planar_out:
            frame = jnp.moveaxis(frame, -1, 1)
        return frame

    timed("comp-hwc   ", hwc, lambda i: comp(i, False),
          lambda b: b[:, 60:62], nb_hwc + nb_rank)
    timed("comp-planar", planar, lambda i: comp(i, True),
          lambda b: b[:, :, 60:62], nb_hwc + nb_rank)

    # Round-5 (verdict #7): the HWC bytes viewed as (B, H, W*3) -- the
    # IDENTICAL row-major byte stream with a lane-friendly 480 minor dim
    # instead of 3. If the flat view fills/composites at planar-like
    # rates and the final reshape back to (B, H, W, 3) stays fused, a
    # flat-viewed producer would beat the direct HWC store; if the
    # reshape materializes a relayout copy at the 11-19 GB/s HWC rate,
    # that closes the floor argument instead.
    flat3 = (N_ENVS, H, W * 3)
    timed("fill-flat3 ", flat3, lambda i: jnp.full(flat3, i, jnp.uint8),
          lambda b: b[:, 60:62], nb_hwc)

    def comp_flat(i, reshape_back):
        frame = comp(i, False)  # (B, H, W, 3) values
        flat = frame.reshape(flat3)
        return flat.reshape(hwc) if reshape_back else flat

    timed("comp-flat3 ", flat3, lambda i: comp_flat(i, False),
          lambda b: b[:, 60:62], nb_hwc + nb_rank)
    timed("comp-flat3r", hwc, lambda i: comp_flat(i, True),
          lambda b: b[:, 60:62], nb_hwc + nb_rank)


if __name__ == "__main__":
    main()
