"""Pallas TPU rasterization kernel.

The jnp rasterizers in `rasterize.py` evaluate the distance test for every
(pixel, segment) pair including the ~90% of padded/invisible segments --
XLA cannot skip work based on the `draw` mask. This path can: segments are
compacted to a small slot array in XLA (top_k + one-hot MXU routing), and
the kernel runs `fori_loop`s with *dynamic* trip counts over only the
live segments. Per segment it evaluates one *unconditional* `win`-row
window whose start row is chosen (at `gran`-row granularity) from the
segment's y-extent during compaction, so the hot loop has a single
dynamic slice and no data-dependent branches. Segments taller than the
window are ordered to a suffix of the slot array and handled by a second
loop with a dynamic per-band tail, so the short-segment majority pays no
tail-loop mechanics at all. Work scales with visible segments (typically
5-40 per layer-frame) instead of the padded max (hundreds).

Measured on a v5e-class chip at 4096 envs x 5 layers x (128,160), ~25
visible segments/env (see docs/KERNELS.md for the variant ablation):
  dense jnp reference                ~580 ms
  per-segment full-frame fori loop     36 ms   (first kernel)
  + SMEM scalars & 8-row band loop     15 ms
  + unconditional 2x16-row band slots 8.7 ms
  + fused 16-row window, 8-row gran,
    pair-unrolled + short/tall tiers  7.8 ms   (this kernel)
  compaction: one-hot over E          9.5 ms
  top_k to k slots + one-hot route    3.3 ms   (this compaction)

Output matches `rasterize.rasterize_masks` except possibly at pixels
sitting exactly on the stroke boundary (d2 == r2 to within one ulp),
where FMA/fusion-order differences between compilations can flip the
comparison (tests/test_rasterize_pallas.py asserts this bound).

Replaces the reference's per-edge cv2.polylines rasterization
(reference: tinycarlo/renderer.py:36-51).
"""
from __future__ import annotations

import os
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinycarlo_tpu.ops.rasterize import (
    _clip_line_cv2,
    _int_endpoints,
    _split_radii,
    _stroke_radius_sq,
)

# Packed band word: bw = b0c * _NB_PACK + nb. Requires ceil(h/gran) <
# _NB_PACK, i.e. h < 4096 rows at gran=8 -- far above any camera frame.
# The word stays exactly representable in f32 (needed because it rides
# through the routing matmul): max value ~ 512 * 512 < 2^24.
_NB_PACK = 512
_NB_SHIFT = 9  # log2(_NB_PACK); kernel decodes bw via shift/mask
# Dead-copy endpoint poison for the pre-decoded SoA (compact_env_idx_soa
# pre=True): far enough off-frame that no stamp predicate can fire
# (split stroke: d2 ~ 3.6e15 >> any r2; bres: |step| >> maj), small
# enough that every f32 intermediate stays finite.
_POISON = jnp.float32(6.0e7)

# X-block width for the lane-split scratch layout (see compact_env_soa):
# one VPU lane tile, so every window touches exactly one lane tile.
_XB = 128


def _scratch_dtype():
    """Strip-scratch element type for the env-merged kernels.
    TINYCARLO_SCRATCH=bf16 selects a bf16 scratch (bit-equal output;
    Mosaic lacks sub-32-bit masked stores so the stamp pays a
    read-select-write) -- measured a WASH vs f32 at the reference
    workload (docs/KERNELS.md round-4): per-window cost is scalar/loop
    mechanics, not store width. f32 stays the default."""
    return (
        jnp.bfloat16
        if os.environ.get("TINYCARLO_SCRATCH") == "bf16"
        else jnp.float32
    )


def _n_xblocks(w: int) -> int:
    """Lane blocks for a frame width: split only when w exceeds one tile.

    Windows on an un-split (w > 128) frame waste most of their lanes --
    the median projected segment spans ~11 px of x -- so frames wider
    than one 128-lane tile are cut into ceil(w/128) blocks, each a row
    strip of the stacked scratch. Windows then do half (w=160) to 1/5th
    (w=640) of the vector work per evaluated segment.
    """
    if os.environ.get("TINYCARLO_NOSPLIT"):
        # A/B toggle: one full-width window per copy (more vector rows,
        # ~30% fewer copies -- relevant now that per-window mechanics,
        # not vector issues, bound the kernel; docs/KERNELS.md round-4)
        return 1
    return -(-w // _XB) if w > _XB else 1


def _window_rows(gran: int, h: int) -> Tuple[int, int, int]:
    """(n_bands, padded height, window rows) for a given granularity.

    Production uses gran=16 (32-row windows): measured FASTER than
    gran=8/16-row windows (7.0 vs 7.7 ms at the 4096-env reference
    workload) despite doubled vector rows per window, because nearly
    every segment becomes single-window -- the per-tall-segment dynamic
    tail `fori_loop` setup costs more than the extra rows. gran=4
    (sub-f32-tile row alignment) measured 9.8 ms; gran=32, 7.7.
    TINYCARLO_WINMULT overrides the window/gran ratio for experiments.
    """
    import os as _os
    mult = int(_os.environ.get("TINYCARLO_WINMULT", 2))
    n_bands = -(-h // gran)
    hp = n_bands * gran
    win = min(mult * gran, hp)
    return n_bands, hp, win



def _stroke_params(thickness: int):
    """Static stroke descriptor threaded into the kernels' window stamps
    (replacing the old scalar r2): ("bres",) for thickness 1 (exact cv2
    Bresenham on clipped anchors, see rasterize._bresenham_hit) or
    ("split", lat2, cap2) for t >= 2 (calibrated rectangle-body +
    end-cap stroke, rasterize._split_radii)."""
    if thickness <= 1:
        return ("bres",)
    lat, cap = _split_radii(thickness)
    return ("split", float(lat * lat), float(cap * cap))


def _window_hit(apx, apy, abx, aby, inv, live, stroke):
    """Shared per-window hit predicate over pixel-relative coords
    (apx, apy) and per-slot scalars. For ("split", lat2, cap2): squared
    distance to the segment against the lateral radius inside the body
    and the cap radius beyond the endpoints; `live` rides in the compare
    constants (dead slots satisfy nothing). For ("bres",): the closed
    form of cv2's 8-connected LineIterator on compaction-clipped,
    anchor-normalized endpoints (abx = dx >= 0, aby = signed minor
    delta, inv = 1/(2*maj)); bit-equal to rasterize._bresenham_hit --
    all intermediate values are integer-valued f32 < 2^24 after
    clipping, with a residual correction keeping the floor division
    exact."""
    stamp_env = os.environ.get("TINYCARLO_STAMP", "")
    if stamp_env == "trivial":
        # measurement-only: a near-free stamp isolating per-window
        # mechanics (scalar loads, loop, slice setup) from vector math
        return live & (apx + apy >= -1e9)
    if stamp_env.startswith("pad"):
        # measurement-only: evaluate the split stroke N times with
        # per-replica perturbations (un-CSE-able) to find where extra
        # vector issues stop hiding under the window's fixed mechanics
        n_pad = int(stamp_env[3:] or 1)
        _, lat2, cap2 = stroke if stroke[0] == "split" else ("", 1.0, 1.0)
        hit = None
        for i in range(n_pad):
            e = 1.0 + 1e-6 * i
            tu = (apx * (abx * e) + apy * aby) * inv
            t = jnp.clip(tu, 0.0, 1.0)
            dx = apx - t * abx
            dy = apy - t * aby
            d2 = dx * dx + dy * dy
            r2v = jnp.where(
                (tu >= 0.0) & (tu <= 1.0),
                jnp.where(live, lat2 * e, -1.0),
                jnp.where(live, cap2 * e, -1.0),
            )
            h = d2 <= r2v
            hit = h if hit is None else (hit & h)
        return hit
    if stroke[0] == "bres":
        ady = jnp.abs(aby)
        sy = jnp.where(aby >= 0.0, 1.0, -1.0)
        xmaj = abx >= ady
        maj = jnp.maximum(abx, ady)
        mino = jnp.minimum(abx, ady)
        step = jnp.where(xmaj, apx, sy * apy)
        num = 2.0 * mino * step + (maj - 1.0)
        q = jnp.floor(num * inv)
        r = num - q * (2.0 * maj)
        q = q + (r >= 2.0 * maj).astype(jnp.float32) - (r < 0.0).astype(
            jnp.float32
        )
        probe = jnp.where(xmaj, apy, apx)
        target = jnp.where(xmaj, sy * q, q)
        hit = (step >= 0.0) & (step <= maj) & (probe == target)
        hit = jnp.where(maj == 0.0, (apx == 0.0) & (apy == 0.0), hit)
        return hit & live
    _, lat2, cap2 = stroke
    tu = (apx * abx + apy * aby) * inv
    t = jnp.clip(tu, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    d2 = dx * dx + dy * dy
    r2v = jnp.where(
        (tu >= 0.0) & (tu <= 1.0),
        jnp.where(live, lat2, -1.0),
        jnp.where(live, cap2, -1.0),
    )
    return d2 <= r2v


def _clip_normalize_t1(w, h, ax0, ay0, bx0, by0, draw):
    """Thickness-1 endpoint preparation shared by the compactions:
    cv2-exact clipLine (rejected lines stop drawing) + anchor
    normalization to the smaller-x endpoint (cv2 LineIterator's
    leftToRight), so the kernels' Bresenham stamp needs no swap."""
    assert w is not None, "thickness-1 compaction needs the frame width"
    ax0, ay0, bx0, by0, acc = _clip_line_cv2(w, h, ax0, ay0, bx0, by0)
    draw = draw & acc
    swap = bx0 < ax0
    nax = jnp.where(swap, bx0, ax0)
    nbx = jnp.where(swap, ax0, bx0)
    nay = jnp.where(swap, by0, ay0)
    nby = jnp.where(swap, ay0, by0)
    return nax, nay, nbx, nby, draw


def _inv_for(abx, aby, thickness):
    """Per-slot `inv` scalar: 1/len^2 for the distance stroke, 1/(2*maj)
    for the t=1 Bresenham stamp."""
    if thickness <= 1:
        maj = jnp.maximum(jnp.abs(abx), jnp.abs(aby))
        return 1.0 / jnp.where(maj == 0.0, 1.0, 2.0 * maj)
    denom = abx * abx + aby * aby
    return 1.0 / jnp.where(denom == 0.0, 1.0, denom)


def compact_soa(
    p0: jnp.ndarray,  # (B, L, E, 2) float pixel coords
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, L, E) bool
    k: int,
    gran: int,
    h: int,
    thickness: int,
    w: Optional[int] = None,
):
    """Compact drawn segments into k slots, split into scalar-friendly SoA.
    `w` (frame width) is required at thickness 1 for the cv2 clip.

    Returns (ax, ay, abx, aby, inv, bw, counts): per-slot f32 endpoint /
    direction / 1/len^2 arrays of shape (B, L, k), a packed int32 band
    word bw = b0c * 512 + nb where b0c is the segment's first `gran`-row
    band clamped so a `win`-row window starting there stays in frame
    (Mosaic can then prove the kernel's dynamic row slice is aligned to
    `gran`), nb its total band count (0 for segments whose stroke misses
    the image rows entirely), and a (3, B*L) int32 count bundle
    [live count, short count, dropped count].

    Slot eligibility is nb > 0 (drawn AND the stroke intersects the
    image rows) -- the same rule as `compact_env_soa` -- so drawn
    segments whose stroke is entirely above/below the frame never
    consume a slot; they could not paint a pixel anyway.

    Routing: one `lax.top_k` over a key that orders eligible-short
    segments first, then eligible-tall (nb > win/gran), then padding --
    original order within each class (rasterization is an OR, so
    reordering is free) -- followed by a one-hot matmul on the MXU,
    measured 3x faster than XLA's take_along_axis gather at this shape.
    The band word is computed per edge *before* routing and rides
    through the matmul as a 5th column. Precision.HIGHEST keeps the
    integer-valued f32 values exact (default TPU matmul precision rounds
    through bf16). With k >= E the routing matmul is replaced by an
    in-place stable short-first ordering of the full slot array.

    Over-subscription (more eligible segments than k) drops short
    segments last, and the overflow is reported in counts[2] (the
    reference draws unbounded segment lists, tinycarlo/renderer.py:41-43,
    so it can never drop -- we at least report); the default k = E
    (`rasterize_masks_pallas` with max_visible=None) never drops
    anything.
    """
    a, b = _int_endpoints(p0, p1, jnp.float32)
    bsz, nl, e, _ = a.shape
    ax0, ay0, bx0, by0 = a[..., 0], a[..., 1], b[..., 0], b[..., 1]
    if thickness <= 1:
        ax0, ay0, bx0, by0, draw = _clip_normalize_t1(
            w, h, ax0, ay0, bx0, by0, draw
        )

    rf = float(_stroke_radius_sq(thickness)) ** 0.5
    n_bands, hp, win = _window_rows(gran, h)
    assert n_bands < _NB_PACK, "frame too tall for the packed band word"
    ylo = jnp.minimum(ay0, by0) - rf
    yhi = jnp.maximum(ay0, by0) + rf
    b0 = jnp.clip(jnp.floor(ylo / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    b1 = jnp.clip(jnp.floor(yhi / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    valid = (yhi >= 0.0) & (ylo <= h - 1.0) & draw
    nb = jnp.where(valid, b1 + 1 - b0, 0)
    # Clamping the window start is safe: it only moves b0 when the
    # segment starts within the last window (b0 > n_bands - win/gran),
    # where nb <= win/gran, so the clamped window still covers every
    # band through b1 and the tail loop stays empty.
    b0c = jnp.minimum(b0, (hp - win) // gran)
    bwf = (b0c * _NB_PACK + nb).astype(jnp.float32)

    tall = nb > win // gran
    iota = jax.lax.broadcasted_iota(jnp.int32, draw.shape, 2)
    key = jnp.where(valid, jnp.where(tall, e - iota, 2 * e - iota), -iota)
    n_elig = jnp.sum(valid, axis=-1).astype(jnp.int32)
    n_all = jnp.minimum(n_elig, k)
    n_short = jnp.minimum(jnp.sum(valid & ~tall, axis=-1), k).astype(jnp.int32)
    n_drop = n_elig - n_all

    segs = jnp.stack([ax0, ay0, bx0, by0, bwf], axis=-1)  # (B,L,E,5)
    if k < e:
        # Key dtype: int32. An ISOLATED top_k probe measures f32 keys
        # ~30% faster (0.95 vs 1.37 ms at (4096, 528)) but the FUSED
        # step is ~0.13 ms SLOWER with the cast (interleaved A/B,
        # docs/KERNELS.md round-4) -- materializing the cast key breaks
        # the fusion that hides key construction. TINYCARLO_SORTKEY=f32
        # selects the float key (selection bit-identical either way:
        # keys are distinct ints <= 3*LE << 2^24).
        kdt = (jnp.float32 if os.environ.get("TINYCARLO_SORTKEY") == "f32"
               else jnp.int32)
        _, idx = jax.lax.top_k(key.astype(kdt), k)  # (B, L, k)
        onehot = (
            idx[..., None]
            == jax.lax.broadcasted_iota(jnp.int32, (bsz, nl, k, e), 3)
        ).astype(jnp.float32)
        comp = jnp.einsum(
            "blke,blef->blkf",
            onehot,
            segs,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        # Full slot array: stable short-first ordering via sort by -key
        # (cheaper than a k = E routing matmul, still one fused sort).
        order = jnp.argsort(-key, axis=-1)
        comp = jnp.take_along_axis(segs, order[..., None], axis=2)

    ax, ay, bx, by = comp[..., 0], comp[..., 1], comp[..., 2], comp[..., 3]
    bw = comp[..., 4].astype(jnp.int32)
    abx, aby = bx - ax, by - ay
    inv = _inv_for(abx, aby, thickness)

    if ax.shape[-1] % 2:
        # Pad the slot axis to even so the pair-unrolled kernel can
        # over-iterate one slot past an odd short count without reading
        # out of bounds; the pad slot draws nothing via nb == 0.
        pad = [(0, 0)] * (bw.ndim - 1) + [(0, 1)]
        ax, ay, abx, aby, inv = (
            jnp.pad(x, pad) for x in (ax, ay, abx, aby, inv)
        )
        bw = jnp.pad(bw, pad)
    counts = jnp.stack(
        [n_all.reshape(-1), n_short.reshape(-1), n_drop.reshape(-1)]
    )
    return ax, ay, abx, aby, inv, bw, counts


def _kernel(
    count_ref,
    ax_ref,
    ay_ref,
    abx_ref,
    aby_ref,
    inv_ref,
    bw_ref,
    out_ref,
    scratch,
    *,
    n_layers,
    h,
    hp,
    w,
    r2,
    gran,
    win,
):
    """One grid instance rasterizes all layer frames of one env.

    Per segment: scalar SMEM loads of the precomputed SoA, then one
    *unconditional* `win`-row window evaluated with a single dynamic
    row slice starting at the precomputed clamped band. The distance
    test is exact per pixel, so evaluating rows outside the segment's
    true y-extent only re-derives zeros/correct hits -- no per-row
    masking is needed beyond killing nb == 0 segments. This keeps the
    hot loops free of data-dependent branches (measured 23% faster than
    `pl.when`-guarded slots, and ~10% faster than two separately sliced
    16-row slots).

    Short segments (the ~80% with nb <= win/gran, ordered to the slot
    prefix by compaction) run in a pair-unrolled loop with no tail
    construct at all; tall segments (slot suffix) run singly with a
    dynamic per-band tail. The short pair loop may over-run one slot
    into the tall suffix on an odd short count -- harmless, the window
    redraw is idempotent and the tall loop re-covers that slot.
    """
    xs = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(jnp.float32)
    ys0 = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0).astype(jnp.float32)
    xs_t = jax.lax.broadcasted_iota(jnp.int32, (gran, w), 1).astype(jnp.float32)
    ys_t = jax.lax.broadcasted_iota(jnp.int32, (gran, w), 0).astype(jnp.float32)
    i = pl.program_id(0)

    def frame(l, n, ns):
        scratch[:] = jnp.zeros((hp, w), jnp.float32)

        def window(s):
            ax = ax_ref[0, l, s]
            ay = ay_ref[0, l, s]
            abx = abx_ref[0, l, s]
            aby = aby_ref[0, l, s]
            inv = inv_ref[0, l, s]
            bw = bw_ref[0, l, s]
            b0c = bw // _NB_PACK
            nb = bw - b0c * _NB_PACK

            y0 = b0c * gran
            ysf = ys0 + y0.astype(jnp.float32)
            apx = xs - ax
            apy = ysf - ay
            hit = _window_hit(apx, apy, abx, aby, inv, nb > 0, r2)
            cur = scratch[pl.ds(y0, win), :]
            scratch[pl.ds(y0, win), :] = jnp.where(hit, 255.0, cur)
            return ax, ay, abx, aby, inv, b0c, nb

        def short_pair(p, _):
            window(2 * p)
            window(2 * p + 1)
            return 0

        jax.lax.fori_loop(0, (ns + 1) // 2, short_pair, 0)

        def tall_one(s, _):
            ax, ay, abx, aby, inv, b0c, nb = window(s)

            def tail(bi, _):
                ty0 = bi * gran
                tysf = ys_t + ty0.astype(jnp.float32)
                tapx = xs_t - ax
                tapy = tysf - ay
                thit = _window_hit(tapx, tapy, abx, aby, inv, True, r2)
                tcur = scratch[pl.ds(ty0, gran), :]
                scratch[pl.ds(ty0, gran), :] = jnp.where(thit, 255.0, tcur)
                return 0

            # Tall segments: bands past the fused window. b0c is only
            # clamped below b0 when nb <= win/gran (see compact_soa), in
            # which case this segment is short, so basing the tail on
            # b0c is exact here.
            jax.lax.fori_loop(b0c + win // gran, b0c + nb, tail, 0)
            return 0

        jax.lax.fori_loop(ns, n, tall_one, 0)
        # f32 -> int32 -> uint8: the direct f32->uint8 cast miscompiles
        # in Mosaic (values land as garbage), the int32 hop is exact
        out_ref[0, l] = scratch[:h].astype(jnp.int32).astype(jnp.uint8)

    for l in range(n_layers):
        n = count_ref[0, i * n_layers + l]
        ns = count_ref[1, i * n_layers + l]

        # Empty frames (realistic workloads: ~50%+ of (env, layer)
        # frames -- rear/far layers are usually fully clipped) skip the
        # f32 scratch zero + convert entirely and write the uint8 zeros
        # directly: 4x less vector write work per skipped frame.
        @pl.when(n == 0)
        def _empty(l=l):
            out_ref[0, l] = jnp.zeros((h, w), jnp.uint8)

        @pl.when(n > 0)
        def _live(l=l, n=n, ns=ns):
            frame(l, n, ns)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "thickness", "gran", "interpret"),
)
def rasterize_compact_soa(
    soa,  # from compact_soa, leading dims (B, L)
    resolution: Tuple[int, int],
    thickness: int = 1,
    gran: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, L, H, W) uint8 masks from a compacted SoA segment bundle.

    `gran` must match the granularity passed to `compact_soa`.
    """
    ax, ay, abx, aby, inv, bw, counts = soa
    h, w = resolution
    bsz, nl, k = ax.shape
    _, hp, win = _window_rows(gran, h)
    r2 = _stroke_params(thickness)
    kernel = functools.partial(
        _kernel,
        n_layers=nl,
        h=h,
        hp=hp,
        w=w,
        r2=r2,
        gran=gran,
        win=win,
    )
    smem = pl.BlockSpec((1, nl, k), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the (2, B*L) count bundle lands in SMEM
        grid=(bsz,),
        in_specs=[smem] * 6,
        out_specs=pl.BlockSpec((1, nl, h, w), lambda i, c: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((hp, w), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, nl, h, w), jnp.uint8),
        interpret=interpret,
    )(counts, ax, ay, abx, aby, inv, bw)


def compact_env_soa(
    p0: jnp.ndarray,  # (B, L, E, 2) float pixel coords
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, L, E) bool
    k: int,
    gran: int,
    h: int,
    thickness: int,
    edge_layer: Optional[jnp.ndarray] = None,  # (E,) int32, see below
    n_layers: Optional[int] = None,
    w: Optional[int] = None,
):
    """Compact drawn segments of ALL layers of an env into k slots.

    Same routing scheme as `compact_soa` (short-first/tall-suffix key,
    `lax.top_k` + one-hot MXU matmul at Precision.HIGHEST) but over the
    flattened (layer, edge) axis, so one kernel grid instance can
    rasterize a whole env in a single segment loop instead of one loop
    per (env, layer) frame -- the per-frame scalar mechanics are the
    kernel's dominant fixed cost (docs/KERNELS.md, honest-floor note).

    The layer is folded in at compaction time by shifting the segment
    into the kernel's STACKED scratch coordinates (all layer frames
    concatenated on the row axis): ay/by gain lay * hp and the band
    word's start band gains lay * hp/gran. The per-window kernel decode
    is then byte-identical to the per-frame kernel's -- an earlier
    variant that packed the layer id into the band word and unpacked it
    per window cost ~2 ms in extra per-segment scalar work. The image-
    space distance test is unaffected: both ysf and ay carry the same
    lay * hp offset, which cancels in apy (exactly -- the values are
    integer-valued f32 well under 2^24).

    Returns (ax, ay, abx, aby, inv, bw, counts) with per-slot shapes
    (B, k) and an int32 (3, B) count bundle [live, short, dropped].

    With `edge_layer`/`n_layers` given, the input is a PACKED edge axis
    (all layers' real edges concatenated; map_compiler packed_* arrays)
    with shape (B, 1, E, 2): each edge's layer comes from edge_layer
    instead of the axis-1 position. This avoids scanning per-layer
    padding (~3x fewer slots on reference maps).

    With `w` given and wider than one 128-lane tile, frames are split
    into ceil(w/128) lane blocks stacked on the scratch row axis (the
    lane-split layout; `_n_xblocks`). A segment gets one slot copy per
    block its stroke's x-range touches, endpoints shifted into
    block-local lane coords and the block id folded into the row band
    exactly like the layer id, so the kernel's window decode is
    unchanged while each window does one lane tile of vector work
    instead of ceil(w/128). Pass the same `w` to
    `rasterize_compact_env_soa`.

    Over-subscription (more than k eligible slot copies in an env
    across all layers) drops short slot copies last and reports the
    overflow in counts[2]. Under the lane split a dropped copy loses
    only that segment's pixels within one 128-lane block -- a partially
    drawn segment, not an all-or-nothing drop.
    """
    a, b = _int_endpoints(p0, p1, jnp.float32)
    bsz, nl, e, _ = a.shape
    ax0, ay0, bx0, by0 = a[..., 0], a[..., 1], b[..., 0], b[..., 1]
    if thickness <= 1:
        ax0, ay0, bx0, by0, draw = _clip_normalize_t1(
            w, h, ax0, ay0, bx0, by0, draw
        )

    rf = float(_stroke_radius_sq(thickness)) ** 0.5
    n_bands, hp, win = _window_rows(gran, h)
    n_frames = nl if edge_layer is None else n_layers
    nxb = _n_xblocks(w) if w is not None else 1
    # The row-band word must stay exactly representable in f32 through
    # the routing matmul: (frame * n_bands + b0c) * 512 + nb < 2^24,
    # and nb itself must not alias into the next band-word bucket.
    assert n_bands < _NB_PACK, "frame too tall for the packed band word"
    assert n_frames * nxb * n_bands < (1 << 24) // _NB_PACK, (
        "stacked frames too tall for band word"
    )
    ylo = jnp.minimum(ay0, by0) - rf
    yhi = jnp.maximum(ay0, by0) + rf
    b0 = jnp.clip(jnp.floor(ylo / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    b1 = jnp.clip(jnp.floor(yhi / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    valid = (yhi >= 0.0) & (ylo <= h - 1.0) & draw
    nb = jnp.where(valid, b1 + 1 - b0, 0)
    b0c = jnp.minimum(b0, (hp - win) // gran)
    if edge_layer is None:
        lay = jax.lax.broadcasted_iota(jnp.int32, draw.shape, 1)
    else:
        lay = jnp.broadcast_to(edge_layer[None, None, :], draw.shape)

    if nxb > 1:
        xlo = jnp.minimum(ax0, bx0) - rf
        xhi = jnp.maximum(ax0, bx0) + rf
        bidx = jnp.arange(nxb, dtype=jnp.int32)
        xoff = (bidx * _XB).astype(jnp.float32)
        touch = (xlo[..., None] <= xoff + (_XB - 1)) & (
            xhi[..., None] >= xoff
        )
        expand = lambda x: jnp.broadcast_to(x[..., None], x.shape + (nxb,))
        ax0 = ax0[..., None] - xoff
        bx0 = bx0[..., None] - xoff
        ay0, by0, b0c = expand(ay0), expand(by0), expand(b0c)
        nb = jnp.where(touch, nb[..., None], 0)
        frame = expand(lay) * nxb + bidx
    else:
        frame = lay

    roff = (frame * hp).astype(jnp.float32)
    ay0 = ay0 + roff
    by0 = by0 + roff
    w2f = ((frame * n_bands + b0c) * _NB_PACK + nb).astype(jnp.float32)

    le = nl * e * nxb
    flat = lambda x: x.reshape(bsz, le)
    ax0, ay0, bx0, by0, w2f = map(flat, (ax0, ay0, bx0, by0, w2f))
    # Slot eligibility is nb > 0 (drawn AND the stroke intersects this
    # frame strip's rows/lanes) -- a strict subset of `draw` that keeps
    # y-clipped segments and untouched lane blocks out of the slots.
    draw2, tall = flat(nb > 0), flat(nb > win // gran)

    iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, le), 1)
    key = jnp.where(
        draw2, jnp.where(tall, le - iota, 2 * le - iota), -iota
    )
    n_elig = jnp.sum(draw2, axis=-1).astype(jnp.int32)
    n_all = jnp.minimum(n_elig, k)
    n_short = jnp.minimum(
        jnp.sum(draw2 & ~tall, axis=-1), k
    ).astype(jnp.int32)
    n_drop = n_elig - n_all

    segs = jnp.stack([ax0, ay0, bx0, by0, w2f], axis=-1)  # (B, LE, 5)
    if k < le:
        # Key dtype: int32. An ISOLATED top_k probe measures f32 keys
        # ~30% faster (0.95 vs 1.37 ms at (4096, 528)) but the FUSED
        # step is ~0.13 ms SLOWER with the cast (interleaved A/B,
        # docs/KERNELS.md round-4) -- materializing the cast key breaks
        # the fusion that hides key construction. TINYCARLO_SORTKEY=f32
        # selects the float key (selection bit-identical either way:
        # keys are distinct ints <= 3*LE << 2^24).
        kdt = (jnp.float32 if os.environ.get("TINYCARLO_SORTKEY") == "f32"
               else jnp.int32)
        _, idx = jax.lax.top_k(key.astype(kdt), k)  # (B, k)
        onehot = (
            idx[..., None]
            == jax.lax.broadcasted_iota(jnp.int32, (bsz, k, le), 2)
        ).astype(jnp.float32)
        comp = jnp.einsum(
            "bke,bef->bkf",
            onehot,
            segs,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        order = jnp.argsort(-key, axis=-1)
        comp = jnp.take_along_axis(segs, order[..., None], axis=1)

    ax, ay, bx, by = comp[..., 0], comp[..., 1], comp[..., 2], comp[..., 3]
    bw = comp[..., 4].astype(jnp.int32)
    abx, aby = bx - ax, by - ay
    inv = _inv_for(abx, aby, thickness)

    if ax.shape[-1] % 2:
        pad = [(0, 0), (0, 1)]
        ax, ay, abx, aby, inv = (
            jnp.pad(x, pad) for x in (ax, ay, abx, aby, inv)
        )
        bw = jnp.pad(bw, pad)
    counts = jnp.stack([n_all, n_short, n_drop])
    return ax, ay, abx, aby, inv, bw, counts


def _kernel_env(
    count_ref,
    ax_ref,
    ay_ref,
    abx_ref,
    aby_ref,
    inv_ref,
    bw_ref,
    out_ref,
    scratch,
    *,
    n_layers,
    h,
    hp,
    w,
    r2,
    gran,
    win,
    nxb,
):
    """One grid instance rasterizes ALL layers of one env in one pass.

    The scratch holds the n_layers * nxb frame strips stacked on the row
    axis ((n_layers * nxb * hp, wb) f32, wb = lane-block width). Segments
    arrive pre-shifted into stacked strip coordinates (see
    `compact_env_soa`), so the per-window decode and math are
    byte-identical to `_kernel`'s -- only the scratch size, the final
    per-layer converts (which concatenate the nxb lane strips back into
    a (h, w) frame), and one segment loop (and count load, and scratch
    zero) per ENV instead of per (env, layer) frame differ. The
    per-frame scalar mechanics were measured at ~1 us of fixed cost per
    frame (docs/KERNELS.md honest-floor note) and dominate at realistic
    ~5-segment frames; the lane split cuts per-window vector work to one
    lane tile (the kernel was vector-issue bound at w > 128).
    """
    wb = _XB if nxb > 1 else w
    xs = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 1).astype(jnp.float32)
    ys0 = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 0).astype(jnp.float32)
    xs_t = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 1).astype(jnp.float32)
    ys_t = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 0).astype(jnp.float32)
    i = pl.program_id(0)
    n = count_ref[0, i]
    ns = count_ref[1, i]

    @pl.when(n == 0)
    def _empty():
        for l in range(n_layers):
            out_ref[0, l] = jnp.zeros((h, w), jnp.uint8)

    @pl.when(n > 0)
    def _live():
        scratch[:] = jnp.zeros((n_layers * nxb * hp, wb), jnp.float32)

        def window(s):
            ax = ax_ref[0, 0, s]
            ay = ay_ref[0, 0, s]
            abx = abx_ref[0, 0, s]
            aby = aby_ref[0, 0, s]
            inv = inv_ref[0, 0, s]
            bw = bw_ref[0, 0, s]
            b0c = bw // _NB_PACK
            nb = bw - b0c * _NB_PACK

            y0 = b0c * gran
            ysf = ys0 + y0.astype(jnp.float32)
            apx = xs - ax
            apy = ysf - ay
            hit = _window_hit(apx, apy, abx, aby, inv, nb > 0, r2)
            cur = scratch[pl.ds(y0, win), :]
            scratch[pl.ds(y0, win), :] = jnp.where(hit, 255.0, cur)
            return ax, ay, abx, aby, inv, b0c, nb

        def short_pair(p, _):
            window(2 * p)
            window(2 * p + 1)
            return 0

        jax.lax.fori_loop(0, (ns + 1) // 2, short_pair, 0)

        def tall_one(s, _):
            ax, ay, abx, aby, inv, b0c, nb = window(s)

            def tail(bi, _):
                ty0 = bi * gran
                tysf = ys_t + ty0.astype(jnp.float32)
                tapx = xs_t - ax
                tapy = tysf - ay
                thit = _window_hit(tapx, tapy, abx, aby, inv, True, r2)
                tcur = scratch[pl.ds(ty0, gran), :]
                scratch[pl.ds(ty0, gran), :] = jnp.where(thit, 255.0, tcur)
                return 0

            jax.lax.fori_loop(b0c + win // gran, b0c + nb, tail, 0)
            return 0

        jax.lax.fori_loop(ns, n, tall_one, 0)
        for l in range(n_layers):
            # f32 -> int32 -> uint8 (direct f32->uint8 miscompiles)
            if nxb == 1:
                frame = scratch[l * hp : l * hp + h]
            else:
                strips = [
                    scratch[(l * nxb + b) * hp : (l * nxb + b) * hp + h]
                    for b in range(nxb)
                ]
                frame = jnp.concatenate(strips, axis=1)[:, :w]
            out_ref[0, l] = frame.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_layers", "resolution", "thickness", "gran", "split", "interpret",
    ),
)
def rasterize_compact_env_soa(
    soa,  # from compact_env_soa, leading dim (B,)
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    gran: int = 8,
    split: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, L, H, W) uint8 masks from an env-merged compacted bundle.

    `gran` must match the granularity passed to `compact_env_soa`, and
    `split` must be True iff `compact_env_soa` was given `w` (the
    lane-split layout -- slot coordinates differ between the layouts).
    """
    ax, ay, abx, aby, inv, bw, counts = soa
    h, w = resolution
    bsz, k = ax.shape
    _, hp, win = _window_rows(gran, h)
    nxb = _n_xblocks(w) if split else 1
    r2 = _stroke_params(thickness)
    kernel = functools.partial(
        _kernel_env,
        n_layers=n_layers,
        h=h,
        hp=hp,
        w=w,
        r2=r2,
        gran=gran,
        win=win,
        nxb=nxb,
    )
    # SoA arrays carry a dummy middle axis: Pallas requires the last two
    # block dims to divide (8, 128) or equal the array dims, which a
    # (1, k) block over (B, k) cannot satisfy -- (1, 1, k) over
    # (B, 1, k) can.
    smem = pl.BlockSpec(
        (1, 1, k), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    wb = _XB if nxb > 1 else w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the (2, B) count bundle lands in SMEM
        grid=(bsz,),
        in_specs=[smem] * 6,
        out_specs=pl.BlockSpec((1, n_layers, h, w), lambda i, c: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((n_layers * nxb * hp, wb), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_layers, h, w), jnp.uint8),
        interpret=interpret,
    )(
        counts,
        *(x.reshape(bsz, 1, k) for x in (ax, ay, abx, aby, inv, bw)),
    )


def compact_env_idx(
    p0: jnp.ndarray,  # (B, L, E, 2) float pixel coords
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, L, E) bool
    k: int,
    gran: int,
    h: int,
    thickness: int,
    edge_layer: Optional[jnp.ndarray] = None,
    n_layers: Optional[int] = None,
    w: Optional[int] = None,
    one_tier: bool = False,
    layer_bounds: Optional[Tuple[int, ...]] = None,
    pre: bool = False,
):
    """Point-array entry: slices the stacked endpoints and delegates to
    `compact_env_idx_soa` (see there for semantics)."""
    return compact_env_idx_soa(
        p0[..., 0], p0[..., 1], p1[..., 0], p1[..., 1], draw,
        k, gran, h, thickness, edge_layer=edge_layer, n_layers=n_layers,
        w=w, one_tier=one_tier, layer_bounds=layer_bounds, pre=pre,
    )


def compact_env_idx_soa(
    u0: jnp.ndarray,  # (B, L, E) float pixel coords, SoA
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, L, E) bool
    k: int,
    gran: int,
    h: int,
    thickness: int,
    edge_layer: Optional[jnp.ndarray] = None,
    n_layers: Optional[int] = None,
    w: Optional[int] = None,
    one_tier: bool = False,
    layer_bounds: Optional[Tuple[int, ...]] = None,
    pre: bool = False,
):
    """Index-indirection variant of `compact_env_soa`: no routing matmul.

    Computes the same per-copy SoA (endpoint / direction / 1/len^2 /
    packed band word, lane-split and layer-fold included) DENSELY on the
    (B, LE) copy axis -- cheap elementwise math -- and compacts only the
    *indices*: `lax.top_k` over the short-first eligibility key yields a
    (B, k) int32 slot->copy map. The kernel reads the SoA through the
    index (two SMEM scalar loads instead of one), so the one-hot
    (B, k, LE) routing tensor and its MXU matmul are never built. Dead
    slots point at ineligible copies, whose nb == 0 kills the window.

    Returns (idx, ax, ay, abx, aby, inv, bw[, y0i], counts): idx (B, k)
    int32, SoA arrays (B, LE) f32 / int32 bw, counts (4 + n_layers, B)
    int32 -- rows [live, one-band count, short count, dropped,
    per-layer live * n_layers]. With `pre=True` the bundle additionally
    carries y0i -- the
    pre-decoded stacked window row -- with ay pre-shifted into window
    coordinates and dead copies' endpoints poisoned (see the inline
    note); `pre=False` keeps the round-4 8-tuple (the rank kernel's
    contract, whose decode peels the layer id off the band word). Slots are ordered one-band (nb == 1) first, then
    remaining shorts (nb == 2), then talls: the kernel's one-band tier
    evaluates an 8-row window (half the vector issues of the fused
    16-row window), which ~37% of realistic segments qualify for. The
    per-layer rows let the kernel skip zeroing / converting layers with
    no eligible segments. The band word stores the UNCLAMPED start band
    (the one-band tier needs it exact); 16-row tiers clamp it in-kernel.
    Same eligibility / budget semantics as `compact_env_soa`.

    `layer_bounds` (static cumulative per-layer edge offsets into the
    E axis, len n_layers + 1) lets the per-layer counts reduce over
    static slices of the copy axis instead of materializing a
    (B, L, LE) one-hot; it requires the edge axis to be
    layer-contiguous in that order (true for the packed axis --
    map_compiler.packed_layer_bounds -- and trivially for the padded
    per-layer axis, where it is multiples of E).
    """
    lim = jnp.float32(1_000_000.0)  # _int_endpoints, per coordinate

    def icast(x):
        return jnp.clip(x, -lim, lim).astype(jnp.int32).astype(jnp.float32)

    ax0, ay0, bx0, by0 = icast(u0), icast(v0), icast(u1), icast(v1)
    if thickness <= 1:
        ax0, ay0, bx0, by0, draw = _clip_normalize_t1(
            w, h, ax0, ay0, bx0, by0, draw
        )
    bsz, nl, e = ax0.shape

    rf = float(_stroke_radius_sq(thickness)) ** 0.5
    n_bands, hp, win = _window_rows(gran, h)
    n_frames = nl if edge_layer is None else n_layers
    nxb = _n_xblocks(w) if w is not None else 1
    assert n_bands < _NB_PACK, "frame too tall for the packed band word"
    assert n_frames * nxb * n_bands < (1 << 24) // _NB_PACK, (
        "stacked frames too tall for band word"
    )
    ylo = jnp.minimum(ay0, by0) - rf
    yhi = jnp.maximum(ay0, by0) + rf
    b0 = jnp.clip(jnp.floor(ylo / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    b1 = jnp.clip(jnp.floor(yhi / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    valid = (yhi >= 0.0) & (ylo <= h - 1.0) & draw
    nb = jnp.where(valid, b1 + 1 - b0, 0)
    b0c = jnp.minimum(b0, (hp - win) // gran)
    if edge_layer is None:
        lay = jax.lax.broadcasted_iota(jnp.int32, draw.shape, 1)
    else:
        lay = jnp.broadcast_to(edge_layer[None, None, :], draw.shape)

    if nxb > 1:
        xlo = jnp.minimum(ax0, bx0) - rf
        xhi = jnp.maximum(ax0, bx0) + rf
        bidx = jnp.arange(nxb, dtype=jnp.int32)
        xoff = (bidx * _XB).astype(jnp.float32)
        touch = (xlo[..., None] <= xoff + (_XB - 1)) & (
            xhi[..., None] >= xoff
        )
        expand = lambda x: jnp.broadcast_to(x[..., None], x.shape + (nxb,))
        ax0 = ax0[..., None] - xoff
        bx0 = bx0[..., None] - xoff
        ay0, by0, b0c = expand(ay0), expand(by0), expand(b0c)
        b0 = expand(b0)
        nb = jnp.where(touch, nb[..., None], 0)
        frame = expand(lay) * nxb + bidx
    else:
        frame = lay

    roff = (frame * hp).astype(jnp.float32)
    ay0 = ay0 + roff
    by0 = by0 + roff
    # With the one-band tier enabled, nb == 1 slots carry the TRUE start
    # band -- their 8-row window must land exactly; wider tiers carry
    # the clamped start so the unconditional 16-row window stays inside
    # the frame strip. (Measured on the realistic workload the one-band
    # tier LOSES ~0.3 ms -- only 23% of copies qualify and the extra
    # loop overhead eats the saved issues -- so it is off by default;
    # docs/KERNELS.md round-2 notes.)
    b0enc = jnp.where(nb == 1, b0, b0c) if one_tier else b0c
    bw = (frame * n_bands + b0enc) * _NB_PACK + nb
    # Pre-decoded window row (round-5, docs/KERNELS.md): the exact value
    # the kernel's shift-decode of bw yields, times gran -- shipped as
    # its own scalar so the short tiers replace the per-window decode
    # ARITHMETIC on the sequencer's scalar unit (the one component every
    # round-4/5 ablation kept while the half-window probe priced windows
    # at ~20 ns each) with one SMEM load (loads measured free, NOLOAD).
    y0i = (frame * n_bands + b0enc) * gran

    le = nl * e * nxb
    flat = lambda x: x.reshape(bsz, le)
    ax0, ay0, bx0, by0, bw, y0i = map(flat, (ax0, ay0, bx0, by0, bw, y0i))
    draw2 = flat(nb > 0)
    one = flat(nb == 1)
    tall = flat(nb > win // gran)

    abx, aby = bx0 - ax0, by0 - ay0
    inv = _inv_for(abx, aby, thickness)
    if pre:
        # ay pre-shifted into window coordinates (f32-exact: both terms
        # are integer-valued and < 2^24 -- identical bits to the
        # kernel's own `ay - y0` subtraction), and DEAD copies'
        # endpoints poisoned far off-frame so the pre-decoded stamp
        # needs no per-window liveness scalar: the x8 overrun pads
        # reference the globally-last slot (a dead copy whenever any
        # copy is ineligible), whose poisoned window satisfies neither
        # the split-stroke distance test nor the Bresenham step bounds.
        ay0 = jnp.where(draw2, ay0 - y0i.astype(jnp.float32), _POISON)
        ax0 = jnp.where(draw2, ax0, _POISON)

    iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, le), 1)
    if one_tier:
        key = jnp.where(
            draw2,
            jnp.where(
                one, 3 * le - iota,
                jnp.where(tall, le - iota, 2 * le - iota),
            ),
            -iota,
        )
    else:
        key = jnp.where(
            draw2, jnp.where(tall, le - iota, 2 * le - iota), -iota
        )
    n_elig = jnp.sum(draw2, axis=-1).astype(jnp.int32)
    n_all = jnp.minimum(n_elig, k)
    if one_tier:
        n_one = jnp.minimum(
            jnp.sum(draw2 & one, axis=-1), k
        ).astype(jnp.int32)
    else:
        n_one = jnp.zeros_like(n_all)
    n_short = jnp.minimum(
        jnp.sum(draw2 & ~tall, axis=-1), k
    ).astype(jnp.int32)
    n_drop = n_elig - n_all

    if k < le:
        # Key dtype: int32. An ISOLATED top_k probe measures f32 keys
        # ~30% faster (0.95 vs 1.37 ms at (4096, 528)) but the FUSED
        # step is ~0.13 ms SLOWER with the cast (interleaved A/B,
        # docs/KERNELS.md round-4) -- materializing the cast key breaks
        # the fusion that hides key construction. TINYCARLO_SORTKEY=f32
        # selects the float key (selection bit-identical either way:
        # keys are distinct ints <= 3*LE << 2^24).
        kdt = (jnp.float32 if os.environ.get("TINYCARLO_SORTKEY") == "f32"
               else jnp.int32)
        _, idx = jax.lax.top_k(key.astype(kdt), k)  # (B, k)
    else:
        idx = jnp.argsort(-key, axis=-1).astype(jnp.int32)
    # Pad slots (duplicates of the last): each tier's unrolled loop may
    # over-run past its end -- the redraw is an idempotent OR, so an
    # over-run into the pad (or the next tier) is harmless.
    idx = jnp.concatenate([idx] + [idx[:, -1:]] * 7, axis=-1)
    n_out_layers = nl if edge_layer is None else n_layers
    if edge_layer is None:
        # padded per-layer axis: layer l occupies flat [l*e*nxb, ...)
        bounds = tuple(range(0, (nl + 1) * e, e))
    else:
        bounds = layer_bounds
    if bounds is not None and len(bounds) == n_out_layers + 1:
        # layer-contiguous copy axis: per-layer counts are reductions
        # over STATIC slices -- no (B, L, LE) one-hot materialization
        per_layer = jnp.stack(
            [
                jnp.sum(
                    draw2[:, bounds[l] * nxb : bounds[l + 1] * nxb],
                    axis=-1,
                    dtype=jnp.int32,
                )
                for l in range(n_out_layers)
            ],
            axis=-1,
        )  # (B, n_layers) eligible copies per layer
    else:
        lay_flat = flat(jnp.broadcast_to(
            lay[..., None] if nxb > 1 else lay, nb.shape))
        onehot_l = lay_flat[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (bsz, n_out_layers, le), 1
        )
        per_layer = jnp.sum(
            draw2[:, None, :] & onehot_l, axis=-1, dtype=jnp.int32
        )  # (B, n_layers) eligible copies per layer
    counts = jnp.concatenate(
        [jnp.stack([n_all, n_one, n_short, n_drop]), per_layer.T], axis=0
    )
    if pre:
        return idx, ax0, ay0, abx, aby, inv, bw, y0i, counts
    return idx, ax0, ay0, abx, aby, inv, bw, counts


def compact_env_seg(
    u0: jnp.ndarray,  # (B, L, E) float pixel coords, SoA
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, L, E) bool
    k: int,
    gran: int,
    h: int,
    thickness: int,
    edge_layer: Optional[jnp.ndarray] = None,
    n_layers: Optional[int] = None,
    w: Optional[int] = None,
    layer_bounds: Optional[Tuple[int, ...]] = None,
):
    """SEGMENT-axis compaction: one slot per segment, not per lane-block
    copy (compare `compact_env_idx_soa`, whose copy axis is nxb x
    larger). Kept as a measured-SLOWER alternate: fused with
    `rasterize_env_seg` it ran 13.1 vs 9.2 ms at the 4096-env reference
    workload (same tenancy window) -- the per-slot `pl.when` block
    branches in the kernel cost more than the halved sort axis saves;
    the production path stays on the XLA-side copy expansion
    (docs/KERNELS.md round-3). The x-block split rides as an nxb-bit
    touch mask packed into the band word's low bits and is expanded
    in-kernel, so:

    - the top_k sort axis and every dense (B, LE) intermediate shrink
      by ceil(w/128)x (640-wide frames: 5x),
    - `max_visible` budgets exactly SEGMENTS per env (the user-facing
      semantics), with no slot-copy scaling,
    - segments with no touched block (fully x-clipped) are culled like
      y-clipped ones (nb forced to 0 -- a strictly better use of budget
      than compact_env_idx, which only y-culls).

    Word layout: bw = ((lay*nxb*nb_bands + b0c) * _NB_PACK + nb) <<
    nxb | touch_bits, all int32. The kernel recovers the per-block
    window start as (enc + xb*n_bands)*gran and shifts ax by xb*128 /
    ay by xb*hp per set bit. ay is pre-folded with the layer's strip
    base (lay*nxb*hp); the xb*hp term is added in-kernel.

    Returns the same bundle shape as `compact_env_idx_soa`
    (counts row 1, the one-band tier, is always 0 here).
    """
    lim = jnp.float32(1_000_000.0)  # _int_endpoints, per coordinate

    def icast(x):
        return jnp.clip(x, -lim, lim).astype(jnp.int32).astype(jnp.float32)

    ax0, ay0, bx0, by0 = icast(u0), icast(v0), icast(u1), icast(v1)
    if thickness <= 1:
        ax0, ay0, bx0, by0, draw = _clip_normalize_t1(
            w, h, ax0, ay0, bx0, by0, draw
        )
    bsz, nl, e = ax0.shape

    rf = float(_stroke_radius_sq(thickness)) ** 0.5
    n_bands, hp, win = _window_rows(gran, h)
    n_frames = nl if edge_layer is None else n_layers
    nxb = _n_xblocks(w) if w is not None else 1
    assert n_bands < _NB_PACK, "frame too tall for the packed band word"
    assert (n_frames * nxb * n_bands * _NB_PACK) << nxb < 2**31, (
        "band word with block bits exceeds int32"
    )
    ylo = jnp.minimum(ay0, by0) - rf
    yhi = jnp.maximum(ay0, by0) + rf
    b0 = jnp.clip(jnp.floor(ylo / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    b1 = jnp.clip(jnp.floor(yhi / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    valid = (yhi >= 0.0) & (ylo <= h - 1.0) & draw
    nb = jnp.where(valid, b1 + 1 - b0, 0)
    b0c = jnp.minimum(b0, (hp - win) // gran)
    if edge_layer is None:
        lay = jax.lax.broadcasted_iota(jnp.int32, draw.shape, 1)
    else:
        lay = jnp.broadcast_to(edge_layer[None, None, :], draw.shape)

    xlo = jnp.minimum(ax0, bx0) - rf
    xhi = jnp.maximum(ax0, bx0) + rf
    if nxb > 1:
        bits = sum(
            ((xlo <= j * _XB + (_XB - 1)) & (xhi >= j * _XB)).astype(
                jnp.int32
            )
            << j
            for j in range(nxb)
        )
    else:
        bits = ((xhi >= 0.0) & (xlo <= (w if w else _XB) - 1.0)).astype(
            jnp.int32
        )
    nb = jnp.where(bits > 0, nb, 0)  # fully x-clipped: cull like y-clip

    abx, aby = bx0 - ax0, by0 - ay0
    inv = _inv_for(abx, aby, thickness)
    # layer strip base rides in ay (the xb*hp part is added in-kernel);
    # aby was computed from the raw coords so the fold cancels nowhere
    ay0 = ay0 + (lay * (nxb * hp)).astype(jnp.float32)

    enc = lay * (nxb * n_bands) + b0c
    bw = (((enc * _NB_PACK) + nb) << nxb) | bits

    le = nl * e
    flat = lambda x: x.reshape(bsz, le)
    ax0, ay0, abx, aby, inv, bw = map(flat, (ax0, ay0, abx, aby, inv, bw))
    draw2 = flat(nb > 0)
    tall = flat(nb > win // gran)

    iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, le), 1)
    key = jnp.where(
        draw2, jnp.where(tall, le - iota, 2 * le - iota), -iota
    )
    n_elig = jnp.sum(draw2, axis=-1).astype(jnp.int32)
    n_all = jnp.minimum(n_elig, k)
    n_short = jnp.minimum(
        jnp.sum(draw2 & ~tall, axis=-1), k
    ).astype(jnp.int32)
    n_drop = n_elig - n_all

    if k < le:
        # Key dtype: int32. An ISOLATED top_k probe measures f32 keys
        # ~30% faster (0.95 vs 1.37 ms at (4096, 528)) but the FUSED
        # step is ~0.13 ms SLOWER with the cast (interleaved A/B,
        # docs/KERNELS.md round-4) -- materializing the cast key breaks
        # the fusion that hides key construction. TINYCARLO_SORTKEY=f32
        # selects the float key (selection bit-identical either way:
        # keys are distinct ints <= 3*LE << 2^24).
        kdt = (jnp.float32 if os.environ.get("TINYCARLO_SORTKEY") == "f32"
               else jnp.int32)
        _, idx = jax.lax.top_k(key.astype(kdt), k)  # (B, k)
    else:
        idx = jnp.argsort(-key, axis=-1).astype(jnp.int32)
    idx = jnp.concatenate([idx] + [idx[:, -1:]] * 7, axis=-1)
    n_out_layers = nl if edge_layer is None else n_layers
    if edge_layer is None:
        bounds = tuple(range(0, (nl + 1) * e, e))
    else:
        bounds = layer_bounds
    draw2i = draw2.astype(jnp.int32)
    if bounds is not None and len(bounds) == n_out_layers + 1:
        per_layer = jnp.stack(
            [
                jnp.sum(
                    draw2i[:, bounds[l]: bounds[l + 1]],
                    axis=-1,
                    dtype=jnp.int32,
                )
                for l in range(n_out_layers)
            ],
            axis=-1,
        )
    else:
        lay_flat = flat(lay)
        onehot_l = lay_flat[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (bsz, n_out_layers, le), 1
        )
        per_layer = jnp.sum(
            draw2[:, None, :] & onehot_l, axis=-1, dtype=jnp.int32
        )
    zero = jnp.zeros_like(n_all)
    counts = jnp.concatenate(
        [jnp.stack([n_all, zero, n_short, n_drop]), per_layer.T], axis=0
    )
    return idx, ax0, ay0, abx, aby, inv, bw, counts


def _tier_loops_seg(load, scratch, n, n_short, wb, r2, gran, win,
                    nxb, n_bands, hp):
    """Two-tier slot loops for the SEGMENT-axis bundle: per slot the
    packed word carries an nxb-bit block-touch mask; each set bit stamps
    one window in that block's strip (`pl.when`-guarded, so a segment
    spanning one block pays one window). Shorts are 8-way unrolled;
    talls get the dynamic per-band tail per touched block.
    """
    xs8 = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 1).astype(jnp.float32)
    ys8 = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 0).astype(jnp.float32)
    xs16 = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 1).astype(jnp.float32)
    ys16 = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 0).astype(jnp.float32)

    def stamp(xs, ys, rows, y0, ax, ay, abx, aby, inv, live):
        ay = ay - y0.astype(jnp.float32)
        apx = xs - ax
        apy = ys - ay
        hit = _window_hit(apx, apy, abx, aby, inv, live, r2)
        pltpu.store(
            scratch.at[pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])],
            jnp.full((rows, scratch.shape[-1]), 255.0, jnp.float32),
            mask=hit,
        )

    def win16(s):
        ax, ay, abx, aby, inv, bw2 = load(s)
        bits = jax.lax.rem(bw2, jnp.int32(1 << nxb))
        bw = bw2 // (1 << nxb)
        enc = bw // _NB_PACK
        nb = bw - enc * _NB_PACK
        for xb in range(nxb):
            @pl.when(jax.lax.rem(bits // (1 << xb), jnp.int32(2)) == 1)
            def _blk(xb=xb):
                stamp(
                    xs16, ys16, win, (enc + xb * n_bands) * gran,
                    ax - xb * _XB, ay + xb * hp, abx, aby, inv, nb > 0,
                )
        return ax, ay, abx, aby, inv, enc, nb, bits

    import os as _os
    unroll = int(_os.environ.get("TINYCARLO_UNROLL", 8))

    def pack(p, _):
        for u in range(unroll):
            win16(unroll * p + u)
        return 0

    jax.lax.fori_loop(0, (n_short + unroll - 1) // unroll, pack, 0)

    def tall_one(s, _):
        ax, ay, abx, aby, inv, enc, nb, bits = win16(s)
        for xb in range(nxb):
            @pl.when(jax.lax.rem(bits // (1 << xb), jnp.int32(2)) == 1)
            def _tail_blk(xb=xb):
                def tail(bi, _):
                    stamp(
                        xs8, ys8, gran,
                        (enc + xb * n_bands + bi) * gran,
                        ax - xb * _XB, ay + xb * hp, abx, aby, inv,
                        nb > 0,
                    )
                    return 0

                jax.lax.fori_loop(win // gran, nb, tail, 0)

        return 0

    jax.lax.fori_loop(n_short, n, tall_one, 0)


def _kernel_env_seg(
    count_ref,
    idx_ref,
    ax_ref,
    ay_ref,
    abx_ref,
    aby_ref,
    inv_ref,
    bw_ref,
    out_ref,
    scratch,
    *,
    n_layers,
    h,
    hp,
    w,
    r2,
    gran,
    win,
    nxb,
    n_bands,
):
    """Env-merged kernel over the SEGMENT-axis bundle (`compact_env_seg`):
    same index-indirection SMEM double-read as `_kernel_env_idx`, but
    each slot is a segment whose packed block-touch bits select which
    lane-block strips its window stamps."""
    wb = _XB if nxb > 1 else w
    i = pl.program_id(0)

    n = count_ref[0, i]
    n_short = count_ref[2, i]

    @pl.when(n == 0)
    def _empty():
        for l in range(n_layers):
            out_ref[0, l] = jnp.zeros((h, w), jnp.uint8)

    @pl.when(n > 0)
    def _live():
        for l in range(n_layers):
            @pl.when(count_ref[4 + l, i] > 0)
            def _zero_strip(l=l):
                scratch[l * nxb * hp : (l + 1) * nxb * hp] = jnp.zeros(
                    (nxb * hp, wb), jnp.float32
                )

        def load(s):
            e = idx_ref[0, 0, s]
            return (
                ax_ref[0, 0, e],
                ay_ref[0, 0, e],
                abx_ref[0, 0, e],
                aby_ref[0, 0, e],
                inv_ref[0, 0, e],
                bw_ref[0, 0, e],
            )

        _tier_loops_seg(load, scratch, n, n_short, wb, r2, gran, win,
                        nxb, n_bands, hp)
        for l in range(n_layers):
            liv = count_ref[4 + l, i] > 0

            @pl.when(liv)
            def _convert(l=l):
                if nxb == 1:
                    frame = scratch[l * hp : l * hp + h]
                else:
                    strips = [
                        scratch[
                            (l * nxb + bl) * hp
                            : (l * nxb + bl) * hp + h
                        ]
                        for bl in range(nxb)
                    ]
                    frame = jnp.concatenate(strips, axis=1)[:, :w]
                out_ref[0, l] = frame.astype(jnp.int32).astype(jnp.uint8)

            @pl.when(jnp.logical_not(liv))
            def _zero(l=l):
                out_ref[0, l] = jnp.zeros((h, w), jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_layers", "resolution", "thickness", "gran", "split",
        "interpret",
    ),
)
def rasterize_env_seg(
    soa,  # from compact_env_seg, leading dim (B,)
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    gran: int = 16,
    split: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, L, H, W) uint8 masks from a `compact_env_seg` bundle. The
    production packed path: segment-axis slots, in-kernel lane-block
    expansion. `gran`/`split` must match `compact_env_seg`'s args."""
    idx, ax, ay, abx, aby, inv, bw, counts = soa
    h, w = resolution
    bsz, le = ax.shape
    kp = idx.shape[-1]
    n_bands, hp, win = _window_rows(gran, h)
    nxb = _n_xblocks(w) if split else 1
    r2 = _stroke_params(thickness)
    kernel = functools.partial(
        _kernel_env_seg,
        n_layers=n_layers,
        h=h,
        hp=hp,
        w=w,
        r2=r2,
        gran=gran,
        win=win,
        nxb=nxb,
        n_bands=n_bands,
    )
    smem_idx = pl.BlockSpec(
        (1, 1, kp), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    smem_soa = pl.BlockSpec(
        (1, 1, le), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    wb = _XB if nxb > 1 else w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[smem_idx] + [smem_soa] * 6,
        out_specs=pl.BlockSpec(
            (1, n_layers, h, w), lambda i, c: (i, 0, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((n_layers * nxb * hp, wb), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_layers, h, w), jnp.uint8),
        interpret=interpret,
    )(
        counts,
        idx.reshape(bsz, 1, kp),
        *(x.reshape(bsz, 1, le) for x in (ax, ay, abx, aby, inv, bw)),
    )


def _kernel_env_rank(
    count_ref,
    idx_ref,
    ax_ref,
    ay_ref,
    abx_ref,
    aby_ref,
    inv_ref,
    bw_ref,
    out_ref,
    scratch,
    *,
    n_layers,
    h,
    hp,
    w,
    r2,
    gran,
    win,
    nxb,
    one_tier,
):
    """Rank variant of `_kernel_env_idx` for the rgb fast path: one
    per-env strip, windows stamp max(scratch, layer_id + 1), output is a
    (B, h, w) uint8 rank map (0 = background). Composited to rgb by
    `rasterize.rgb_from_rank` -- identical frames to the per-layer
    masks + paint-order composite at ~1/5th the kernel output bytes
    (docs/KERNELS.md "rank-kernel rgb path")."""
    wb = _XB if nxb > 1 else w
    i = pl.program_id(0)
    n_bands = hp // gran

    n = count_ref[0, i]
    n_one = count_ref[1, i]
    n_short = count_ref[2, i]

    @pl.when(n == 0)
    def _empty():
        out_ref[0] = jnp.zeros((h, w), jnp.uint8)

    @pl.when(n > 0)
    def _live():
        scratch[:] = jnp.zeros((nxb * hp, wb), scratch.dtype)

        def load(s):
            e = idx_ref[0, 0, s]
            return (
                ax_ref[0, 0, e],
                ay_ref[0, 0, e],
                abx_ref[0, 0, e],
                aby_ref[0, 0, e],
                inv_ref[0, 0, e],
                bw_ref[0, 0, e],
            )

        _tier_loops(load, scratch, n, n_one, n_short, wb, r2, gran, win,
                    one_tier=one_tier, rank_decode=(n_bands, nxb, hp))
        if nxb == 1:
            frame = scratch[:h]
        else:
            strips = [
                scratch[bl * hp : bl * hp + h] for bl in range(nxb)
            ]
            frame = jnp.concatenate(strips, axis=1)[:, :w]
        # f32 -> int32 -> uint8 (direct cast miscompiles in Mosaic)
        out_ref[0] = frame.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_layers", "resolution", "thickness", "gran", "split", "one_tier",
        "interpret",
    ),
)
def rasterize_env_rank(
    soa,  # from compact_env_idx_soa, leading dim (B,)
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    gran: int = 8,
    split: bool = False,
    one_tier: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) uint8 layer-rank map from a `compact_env_idx_soa`
    bundle (0 = background, l+1 = layer l painted last). See
    `_kernel_env_rank`."""
    idx, ax, ay, abx, aby, inv, bw, counts = soa
    h, w = resolution
    bsz, le = ax.shape
    kp = idx.shape[-1]
    _, hp, win = _window_rows(gran, h)
    nxb = _n_xblocks(w) if split else 1
    r2 = _stroke_params(thickness)
    kernel = functools.partial(
        _kernel_env_rank,
        n_layers=n_layers,
        h=h,
        hp=hp,
        w=w,
        r2=r2,
        gran=gran,
        win=win,
        nxb=nxb,
        one_tier=one_tier,
    )
    smem_idx = pl.BlockSpec(
        (1, 1, kp), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    smem_soa = pl.BlockSpec(
        (1, 1, le), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    wb = _XB if nxb > 1 else w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[smem_idx] + [smem_soa] * 6,
        out_specs=pl.BlockSpec((1, h, w), lambda i, c: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nxb * hp, wb), _scratch_dtype())],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w), jnp.uint8),
        interpret=interpret,
    )(
        counts,
        idx.reshape(bsz, 1, kp),
        *(x.reshape(bsz, 1, le) for x in (ax, ay, abx, aby, inv, bw)),
    )


def rasterize_rank_packed_soa(
    u0: jnp.ndarray,  # (..., E) packed edge axis, SoA pixel coords
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    draw: jnp.ndarray,  # (..., E)
    edge_layer: jnp.ndarray,  # (E,) int32
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    max_visible: Optional[int] = None,
    interpret: bool = False,
    layer_bounds: Optional[Tuple[int, ...]] = None,
) -> jnp.ndarray:
    """(..., H, W) uint8 layer-rank map (rgb fast path): same compaction
    as `rasterize_masks_packed_pallas_soa`, rank kernel instead of the
    per-layer masks. `rasterize.rgb_from_rank(rank, colors)` composites
    it into exactly the frame `rasterize_rgb` builds from the masks."""
    lead = draw.shape[:-1]
    e = draw.shape[-1]
    h, w = resolution
    nxb = _n_xblocks(w)
    k = e * nxb if max_visible is None else min(max_visible * nxb, e * nxb)
    gran = 16
    u0, v0, u1, v1 = (x.reshape(-1, 1, e) for x in (u0, v0, u1, v1))
    draw = draw.reshape(-1, 1, e)
    soa = compact_env_idx_soa(
        u0, v0, u1, v1, draw, k, gran, h, thickness,
        edge_layer=edge_layer, n_layers=n_layers, w=w,
        layer_bounds=layer_bounds, pre=False,
    )
    rank = rasterize_env_rank(
        soa, n_layers, tuple(resolution), thickness, gran=gran,
        split=True, interpret=interpret,
    )
    return rank.reshape(*lead, h, w)


def _tier_loops(load, scratch, n, n_one, n_short, wb, r2, gran, win,
                one_tier=False, fill=255.0, rank_decode=None):
    """Shared three-tier segment loops over one env's slots.

    `load(s)` returns slot s's SoA scalars (ax, ay, abx, aby, inv, bw).
    Tier 1 (slots [0, n_one)): one-band segments, a single 8-row window
    at the exact band -- half the vector issues of the fused window.
    Tier 2 (slots [n_one, n_short)): two-band segments, the 16-row
    window at the clamped start band. Tier 3 (slots [n_short, n)):
    talls, 16-row window plus a dynamic per-band tail. Tiers 1-2 are
    pair-unrolled; an over-run into the next tier stamps a subset of
    that segment's bands, which its own tier re-covers (idempotent OR /
    max).

    `rank_decode=(n_bands, nxb, hp)` switches to RANK stamping for the
    rgb fast path: the layer id is peeled off the band word's stacked
    frame index (frame = lay * nxb + xb, folded at compaction), the
    window lands in a single per-env strip (the lay * nxb * hp row
    offset is subtracted back out of ay/y0), and hits write
    max(scratch, lay + 1) -- cv2's sequential paint order IS "highest
    layer index wins" (reference renderer.py:41-43), so the rank map
    composites into the identical rgb frame.
    """
    xs8 = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 1).astype(jnp.float32)
    ys8 = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 0).astype(jnp.float32)
    xs16 = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 1).astype(jnp.float32)
    ys16 = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 0).astype(jnp.float32)

    sdt = scratch.dtype
    # TIMING PROBES (wrong output; round-5 store-mechanics decomposition,
    # docs/KERNELS.md): TINYCARLO_STORE=
    #   static -- masked store at a STATIC row 0 (removes the dynamic
    #             row-slice addressing from every window)
    #   nomask -- plain unmasked store at the dynamic row (removes the
    #             mask machinery)
    #   acc8   -- OR the unroll-group's hits in vregs, ONE masked store
    #             per group at row 0 (upper bound for any fewer-stores
    #             reorganization: 8x fewer stores, same stamps/loads)
    store_probe = os.environ.get("TINYCARLO_STORE", "")

    def stamp(xs, ys, rows, y0, ax, ay, abx, aby, inv, live, val=None,
              shifted=False):
        # scalar-unit folds keep the vector loop lean: the window row
        # offset rides in ay, and the live check rides in the compare
        # constant (dead slots get r2 = -1, which nothing satisfies).
        # `shifted=True` (the pre-decoded SoA) means ay ALREADY carries
        # the window shift from compaction.
        if not shifted:
            ay = ay - y0.astype(jnp.float32)
        apx = xs - ax
        apy = ys - ay
        hit = _window_hit(apx, apy, abx, aby, inv, live, r2)
        if store_probe == "static":
            y0 = y0 * 0
        elif store_probe == "nomask":
            pltpu.store(
                scratch.at[pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])],
                jnp.where(
                    hit,
                    jnp.full((rows, scratch.shape[-1]), fill, sdt),
                    jnp.zeros((rows, scratch.shape[-1]), sdt),
                ),
            )
            return
        # The lane slice start is y0 * 0 rather than a literal 0: a
        # Python-int start lowers to int64 under x64 (interpret-mode
        # tests) and dynamic_slice rejects mixed index dtypes; deriving
        # it from y0 keeps both starts int32 in every mode.
        if rank_decode is None:
            if sdt == jnp.float32:
                pltpu.store(
                    scratch.at[
                        pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])
                    ],
                    jnp.full((rows, scratch.shape[-1]), fill, sdt),
                    mask=hit,
                )
            else:
                # Mosaic has no masked store for sub-32-bit data; the
                # narrow-scratch variant pays a read-select-write RMW
                # (half-width loads/stores, so issue count stays ~even
                # with the f32 masked store)
                cur = scratch[
                    pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])
                ]
                scratch[
                    pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])
                ] = jnp.where(hit, sdt.type(fill), cur)
        else:
            cur = scratch[pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])]
            scratch[pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])] = (
                jnp.maximum(
                    cur, jnp.where(hit, val.astype(sdt), sdt.type(0))
                )
            )

    def _decode(ay, bw):
        """(ay', b0', nb, rank): strip coords + layer rank per slot.

        Shift/mask instead of `// _NB_PACK` (a power of two; bw >= 0):
        the decode runs on the sequencer's scalar unit once per WINDOW,
        and an unreduced integer divide there is one of the few
        per-window costs every round-4/5 component probe kept (loads,
        stamps, stores, slice addressing all measured free while the
        half-window probe pays ~20 ns/window -- docs/KERNELS.md
        round-5)."""
        if store_probe == "declite":
            # timing probe (wrong output): no decode at all -- window at
            # band 0, always live; brackets the whole decode chain
            return ay, bw * 0, bw * 0 + 1, None
        b0 = jax.lax.shift_right_logical(bw, jnp.asarray(_NB_SHIFT, bw.dtype))
        nb = bw & (_NB_PACK - 1)
        if rank_decode is None:
            return ay, b0, nb, None
        n_bands, nxb_, hp_ = rank_decode
        fb = n_bands * nxb_
        if fb & (fb - 1) == 0:
            # power-of-two frame stride (the reference 128x160 shape:
            # 8 bands x 2 blocks): the layer peel is a shift/mask too --
            # the rank path's analogue of the round-5 divide fix
            sh = jnp.asarray(fb.bit_length() - 1, b0.dtype)
            lay = jax.lax.shift_right_logical(b0, sh)
            b0 = b0 & (fb - 1)
        else:
            lay = b0 // fb
            b0 = b0 - lay * fb
        ay = ay - (lay * (nxb_ * hp_)).astype(jnp.float32)
        return ay, b0, nb, (lay + 1).astype(jnp.float32)

    def win8(s):
        vals = load(s)
        if len(vals) == 7:  # pre-decoded SoA: no scalar decode at all
            ax, ayw, abx, aby, inv, bw, y0 = vals
            stamp(xs8, ys8, gran, y0, ax, ayw, abx, aby, inv, True,
                  shifted=True)
            return
        ax, ay, abx, aby, inv, bw = vals
        ay, b0, nb, val = _decode(ay, bw)
        stamp(xs8, ys8, gran, b0 * gran, ax, ay, abx, aby, inv, nb > 0, val)

    def win16(s):
        vals = load(s)
        if len(vals) == 7:
            # pre-decoded SoA (compact_env_idx_soa pre=True): the window
            # row arrives as its own scalar, ay is pre-shifted, and dead
            # slots are endpoint-poisoned -- the whole per-window decode
            # chain on the sequencer's scalar unit disappears (round-5,
            # docs/KERNELS.md).
            ax, ayw, abx, aby, inv, bw, y0 = vals
            stamp(xs16, ys16, win, y0, ax, ayw, abx, aby, inv, True,
                  shifted=True)
            return vals
        ax, ay, abx, aby, inv, bw = vals
        ay, b0, nb, val = _decode(ay, bw)
        stamp(xs16, ys16, win, b0 * gran, ax, ay, abx, aby, inv, nb > 0, val)
        return ax, ay, abx, aby, inv, b0, nb, val

    if one_tier:
        import os as _os
        unroll = int(_os.environ.get("TINYCARLO_UNROLL", 8))

        def pack8(p, _):
            for u in range(unroll):
                win8(unroll * p + u)
            return 0

        jax.lax.fori_loop(0, (n_one + unroll - 1) // unroll, pack8, 0)

        def pack16(p, _):
            for u in range(unroll):
                win16(n_one + unroll * p + u)
            return 0

        jax.lax.fori_loop(
            0, (n_short - n_one + unroll - 1) // unroll, pack16, 0
        )
    else:
        # 8-way unroll amortizes the fori_loop iteration mechanics:
        # measured 7.7 (x2) -> 6.6 (x4) -> 6.5 ms (x8) at the 4096-env
        # reference workload; the compaction pads 7 duplicate slots so
        # the over-run past n_short stays in-bounds (idempotent OR).
        import os as _os
        unroll = int(_os.environ.get("TINYCARLO_UNROLL", 8))

        if store_probe in ("acc8", "acc8tree"):
            # timing probe: one store per unroll group (see above).
            # acc8 merges hits with a SERIAL or-chain; acc8tree with a
            # balanced tree -- distinguishing store-count cost from the
            # serial dependency the chain introduces.
            def pack(p, _):
                hits = []
                for u in range(unroll):
                    vals = load(unroll * p + u)
                    if len(vals) == 7:
                        ax, ayw, abx, aby, inv, bw, y0 = vals
                        hits.append(_window_hit(
                            xs16 - ax, ys16 - ayw, abx, aby, inv, True, r2
                        ))
                        continue
                    ax, ay, abx, aby, inv, bw = vals
                    ay, b0, nb, _val = _decode(ay, bw)
                    ayw = ay - (b0 * gran).astype(jnp.float32)
                    hits.append(_window_hit(
                        xs16 - ax, ys16 - ayw, abx, aby, inv, nb > 0, r2
                    ))
                if store_probe == "acc8tree":
                    while len(hits) > 1:
                        hits = [
                            hits[i] | hits[i + 1]
                            for i in range(0, len(hits) - 1, 2)
                        ] + ([hits[-1]] if len(hits) % 2 else [])
                    acc = hits[0]
                else:
                    acc = hits[0]
                    for h in hits[1:]:
                        acc = acc | h
                pltpu.store(
                    scratch.at[
                        pl.ds(p * 0, win), pl.ds(p * 0, scratch.shape[-1])
                    ],
                    jnp.full((win, scratch.shape[-1]), fill, sdt),
                    mask=acc,
                )
                return 0
        else:
            def pack(p, _):
                for u in range(unroll):
                    win16(unroll * p + u)
                return 0

        n_groups = (n_short + unroll - 1) // unroll
        if store_probe == "half":
            # timing probe: run HALF the short-tier windows (wrong
            # output) -- measures the pure window-count slope, i.e. the
            # ceiling any fewer-windows reorganization could reach
            n_groups = n_groups // 2
        jax.lax.fori_loop(0, n_groups, pack, 0)

    def tall_one(s, _):
        out = win16(s)
        if len(out) == 7:
            # pre-decoded bundle: decode bw lazily (talls are ~10% of
            # slots) and restore strip coordinates for the tail stamps
            # (exact: integer-valued f32 round trip)
            ax, ayw, abx, aby, inv, bw, y0 = out
            b0 = jax.lax.shift_right_logical(
                bw, jnp.asarray(_NB_SHIFT, bw.dtype)
            )
            nb = bw & (_NB_PACK - 1)
            ay = ayw + y0.astype(jnp.float32)
            val = None
        else:
            ax, ay, abx, aby, inv, b0, nb, val = out

        def tail(bi, _):
            stamp(
                xs8, ys8, gran, bi * gran, ax, ay, abx, aby, inv, nb > 0,
                val,
            )
            return 0

        jax.lax.fori_loop(b0 + win // gran, b0 + nb, tail, 0)
        return 0

    jax.lax.fori_loop(n_short, n, tall_one, 0)


def _kernel_env_idx(
    count_ref,
    idx_ref,
    *rest,  # SoA refs (6 round-4 / 7 pre-decoded), then out_ref, scratch
    n_layers,
    h,
    hp,
    w,
    r2,
    gran,
    win,
    nxb,
    group,
    one_tier,
    out_dtype=jnp.uint8,
):
    """Env-merged kernel with slot->copy index indirection and optional
    multi-env grid packing, blocked (automatic) output path. This is the
    PRODUCTION kernel (docs/KERNELS.md round-2: index indirection beat
    the one-hot routing matmul; `_kernel_env_dma` is the manual-DMA A/B).

    Same tiered window loops as `_kernel_env_dma` (see `_tier_loops`);
    per slot the SoA scalars are read through `idx_ref` (one extra SMEM
    scalar load), which lets the caller skip the one-hot routing matmul
    entirely. `group` envs share one grid instance.

    `out_dtype=uint8` emits 0/255 masks (the env observation contract,
    reference renderer.py:46-51); a float `out_dtype` emits 0/1 masks for
    in-graph consumers (frozen-encoder feature path, train/td3_loop),
    skipping the uint8 materialization + the downstream /255 convert.
    """
    soa_refs = rest[:-2]
    out_ref, scratch = rest[-2], rest[-1]
    wb = _XB if nxb > 1 else w
    i = pl.program_id(0)
    as_uint8 = out_dtype == jnp.uint8
    fill = 255.0 if as_uint8 else 1.0

    for g in range(group):
        n = count_ref[0, i * group + g]
        n_one = count_ref[1, i * group + g]
        n_short = count_ref[2, i * group + g]

        @pl.when(n == 0)
        def _empty(g=g):
            for l in range(n_layers):
                out_ref[g, l] = jnp.zeros((h, w), out_dtype)

        @pl.when(n > 0)
        def _live(g=g, n=n, n_one=n_one, n_short=n_short):
            # zero only live layers' strips: windows and the convert
            # never touch a dead layer's strip, and dead layers (54% of
            # (env, layer) frames on realistic workloads) skip the f32
            # read + double cast entirely below
            for l in range(n_layers):
                @pl.when(count_ref[4 + l, i * group + g] > 0)
                def _zero_strip(l=l):
                    scratch[l * nxb * hp : (l + 1) * nxb * hp] = jnp.zeros(
                        (nxb * hp, wb), scratch.dtype
                    )

            def load(s, g=g):
                e = idx_ref[g, 0, s]
                return tuple(r[g, 0, e] for r in soa_refs)

            _tier_loops(load, scratch, n, n_one, n_short, wb, r2, gran,
                        win, one_tier=one_tier, fill=fill)
            for l in range(n_layers):
                liv = count_ref[4 + l, i * group + g] > 0

                @pl.when(liv)
                def _convert(l=l, g=g):
                    if nxb == 1:
                        frame = scratch[l * hp : l * hp + h]
                    else:
                        strips = [
                            scratch[
                                (l * nxb + bl) * hp
                                : (l * nxb + bl) * hp + h
                            ]
                            for bl in range(nxb)
                        ]
                        frame = jnp.concatenate(strips, axis=1)[:, :w]
                    if as_uint8:
                        # f32 -> int32 -> uint8 (direct cast miscompiles)
                        out_ref[g, l] = frame.astype(jnp.int32).astype(
                            jnp.uint8
                        )
                    else:
                        out_ref[g, l] = frame.astype(out_dtype)

                @pl.when(jnp.logical_not(liv))
                def _zero(l=l, g=g):
                    out_ref[g, l] = jnp.zeros((h, w), out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_layers", "resolution", "thickness", "gran", "split", "group",
        "one_tier", "interpret", "out_dtype",
    ),
)
def rasterize_env_idx(
    soa,  # from compact_env_idx, leading dim (B,)
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    gran: int = 8,
    split: bool = False,
    group: int = 1,
    one_tier: bool = False,
    interpret: bool = False,
    out_dtype=jnp.uint8,
) -> jnp.ndarray:
    """(B, L, H, W) masks from a `compact_env_idx` bundle via the blocked
    output path -- the PRODUCTION rasterizer (docs/KERNELS.md round-2;
    `rasterize_env_dma` is the manual-DMA A/B variant). `gran`/`split`
    must match `compact_env_idx`'s arguments; `group` packs that many
    envs per grid instance (B must divide by it). `out_dtype=uint8` gives
    0/255 observation masks; a float dtype gives 0/1 masks for in-graph
    consumers (no uint8 materialization, no downstream /255).
    """
    idx, *arrays, counts = soa  # 6 SoA arrays (round-4) or 7 (pre-decoded)
    h, w = resolution
    bsz, le = arrays[0].shape
    kp = idx.shape[-1]
    assert bsz % group == 0, "batch must divide by the env group size"
    _, hp, win = _window_rows(gran, h)
    nxb = _n_xblocks(w) if split else 1
    r2 = _stroke_params(thickness)
    out_dtype = jnp.dtype(out_dtype)
    kernel = functools.partial(
        _kernel_env_idx,
        n_layers=n_layers,
        h=h,
        hp=hp,
        w=w,
        r2=r2,
        gran=gran,
        win=win,
        nxb=nxb,
        group=group,
        one_tier=one_tier,
        out_dtype=out_dtype,
    )
    smem_idx = pl.BlockSpec(
        (group, 1, kp), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    smem_soa = pl.BlockSpec(
        (group, 1, le), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    wb = _XB if nxb > 1 else w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the count bundle lands in SMEM
        grid=(bsz // group,),
        in_specs=[smem_idx] + [smem_soa] * len(arrays),
        out_specs=pl.BlockSpec(
            (group, n_layers, h, w), lambda i, c: (i, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_layers * nxb * hp, wb), _scratch_dtype())
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_layers, h, w), out_dtype),
        interpret=interpret,
    )(
        counts,
        idx.reshape(bsz, 1, kp),
        *(x.reshape(bsz, 1, le) for x in arrays),
    )


def _kernel_env_dma(
    count_ref,
    idx_ref,
    *rest,  # SoA refs (6 round-4 / 7 pre-decoded), out_hbm, scratch, staging, sems
    n_layers,
    h,
    hp,
    w,
    r2,
    gran,
    win,
    nxb,
    group,
    nbuf,
    one_tier,
):
    """Index-indirection kernel with tiered windows and a hand-rolled,
    multi-buffered output DMA.

    The uint8 observation write is the kernel's hard floor (~2.5-3 ms
    for 4096 x 5 x (128,160) regardless of layout, buffering, or store
    skipping -- docs/KERNELS.md round-2 notes). The output stays in HBM
    (`memory_space=ANY`); each grid instance rasterizes `group` envs,
    converts them into one of `nbuf` staging slabs, and issues ONE async
    copy of the whole slab, waiting on the slab's semaphore `nbuf`
    instances later, so several copies ride under the window compute.
    """
    soa_refs = rest[:-4]
    out_hbm, scratch, staging, sems = rest[-4:]
    wb = _XB if nxb > 1 else w
    wp = nxb * _XB if nxb > 1 else max(w, _XB)
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    # program_id is int32 compiled but can be weak-int64 in interpret
    # mode under x64; pin it so rem/slice dtypes agree everywhere
    i = jnp.asarray(i, jnp.int32)
    buf = jax.lax.rem(i, jnp.int32(nbuf))
    st = staging.at[buf]

    def slab_copy(inst, q):
        return pltpu.make_async_copy(
            staging.at[q], out_hbm.at[pl.ds(inst * group, group)], sems.at[q]
        )

    # The slab is free once the DMA issued `nbuf` instances ago landed.
    @pl.when(i >= nbuf)
    def _reclaim():
        slab_copy(i - nbuf, buf).wait()

    for g in range(group):
        env = i * group + g
        n = count_ref[0, env]
        n_one = count_ref[1, env]
        n_short = count_ref[2, env]

        @pl.when(n > 0)
        def _live(env=env, n=n, n_one=n_one, n_short=n_short, g=g):
            # zero only live layers' strips; windows and the convert
            # never touch a dead layer's strip
            for l in range(n_layers):
                @pl.when(count_ref[4 + l, env] > 0)
                def _zero_strip(l=l):
                    scratch[l * nxb * hp : (l + 1) * nxb * hp] = jnp.zeros(
                        (nxb * hp, wb), scratch.dtype
                    )

            def load(s, g=g):
                e = idx_ref[g, 0, s]
                if os.environ.get("TINYCARLO_NOLOAD"):
                    # measurement-only: constant scalars isolate the SMEM
                    # load share of per-window mechanics (output garbage)
                    z = jnp.float32(0.0)
                    base = (z, z, z + 1.0, z, z + 1.0, e * 0 + 513)
                    if len(soa_refs) == 7:
                        return base + (e * 0,)
                    return base
                return tuple(r[g, 0, e] for r in soa_refs)

            _tier_loops(load, scratch, n, n_one, n_short, wb, r2, gran,
                        win, one_tier=one_tier)

        for l in range(n_layers):
            liv = count_ref[4 + l, env] > 0

            @pl.when(liv)
            def _convert(l=l, g=g):
                # f32 -> int32 -> uint8 (direct cast miscompiles).
                # Lanes past w are DMA'd but sliced off by the caller;
                # zero-pad narrow frames so stores and DMA slices stay
                # 128-lane aligned.
                strips = [
                    scratch[(l * nxb + bl) * hp : (l * nxb + bl) * hp + h]
                    for bl in range(nxb)
                ]
                frame = jnp.concatenate(strips, axis=1)
                if frame.shape[1] < wp:
                    frame = jnp.concatenate(
                        [frame, jnp.zeros(
                            (h, wp - frame.shape[1]), jnp.float32)],
                        axis=1,
                    )
                st[g, l] = frame.astype(jnp.int32).astype(jnp.uint8)

            @pl.when(jnp.logical_not(liv))
            def _zero(l=l, g=g):
                st[g, l] = jnp.zeros((h, wp), jnp.uint8)

    slab_copy(i, buf).start()

    # Drain every in-flight DMA at the last instance.
    for d in range(nbuf):
        @pl.when((i == nprog - 1) & (i >= d))
        def _drain(d=d):
            slab_copy(i - d, jax.lax.rem(i - d, jnp.int32(nbuf))).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_layers", "resolution", "thickness", "gran", "split", "group",
        "nbuf", "one_tier", "interpret",
    ),
)
def rasterize_env_dma(
    soa,  # from compact_env_idx, leading dim (B,)
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    gran: int = 8,
    split: bool = False,
    group: int = 8,
    nbuf: int = 3,
    one_tier: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, L, H, W) uint8 masks via the multi-buffered manual-DMA
    kernel. `gran`/`split` must match `compact_env_idx`'s arguments;
    `group` envs share one grid instance and one output DMA (B must
    divide by it), `nbuf` staging slabs ride in flight.

    Internally the HBM output is lane-padded to a 128-multiple width
    (DMA slices must be 128-lane aligned); the returned value is a lazy
    `[..., :w]` slice that fuses into in-graph consumers for free and
    costs one copy only when the observation is itself a program
    output. Requires h to be a multiple of 8 on real hardware (camera
    resolutions are); arbitrary h works in interpret mode.
    """
    idx, *arrays, counts = soa  # 6 SoA arrays (round-4) or 7 (pre-decoded)
    h, w = resolution
    bsz, le = arrays[0].shape
    kp = idx.shape[-1]
    assert bsz % group == 0, "batch must divide by the env group size"
    _, hp, win = _window_rows(gran, h)
    nxb = _n_xblocks(w) if split else 1
    wp = nxb * _XB if nxb > 1 else max(w, _XB)
    r2 = _stroke_params(thickness)
    kernel = functools.partial(
        _kernel_env_dma,
        n_layers=n_layers,
        h=h,
        hp=hp,
        w=w,
        r2=r2,
        gran=gran,
        win=win,
        nxb=nxb,
        group=group,
        nbuf=nbuf,
        one_tier=one_tier,
    )
    smem_idx = pl.BlockSpec(
        (group, 1, kp), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    smem_soa = pl.BlockSpec(
        (group, 1, le), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    wb = _XB if nxb > 1 else w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz // group,),
        in_specs=[smem_idx] + [smem_soa] * len(arrays),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_layers * nxb * hp, wb), _scratch_dtype()),
            pltpu.VMEM((nbuf, group, n_layers, h, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_layers, h, wp), jnp.uint8),
        interpret=interpret,
    )(
        counts,
        idx.reshape(bsz, 1, kp),
        *(x.reshape(bsz, 1, le) for x in arrays),
    )
    return out if wp == w else out[..., :w]


def segment_overflow(
    p0: jnp.ndarray,  # (B, E, 2) packed or (B, L, E, 2) per-layer coords
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, E) or (B, L, E)
    resolution: Tuple[int, int],
    thickness: int,
    max_visible: Optional[int],
    gran: int = 8,
    stroke: str = "fast",
) -> jnp.ndarray:
    """Per-env count of eligible slot copies DROPPED by the compaction
    budget -- the detection hook for `max_visible` oversubscription.

    The reference rasterizes unbounded per-frame segment lists
    (reference: tinycarlo/renderer.py:41-43) so it can never drop; our
    fixed slot budget can, silently corrupting observations on dense
    maps. This computes the same eligibility (nb > 0 per touched
    128-lane block) and budget (max_visible * ceil(w/128)) as
    `compact_env_soa` via `rasterize_masks_packed_pallas` /
    `rasterize_masks_pallas`, without running the compaction, so it is
    cheap enough for a debug-mode check. Returns (B,) int32; zero means
    no observation pixels were lost. A nonzero count under the lane
    split means at least partial segments were dropped.
    """
    if max_visible is None:
        return jnp.zeros(p0.shape[0], jnp.int32)
    h, w = resolution
    nxb = _n_xblocks(w)
    if draw.ndim == 2:  # packed edge axis
        p0, p1, draw = p0[:, None], p1[:, None], draw[:, None]
    a, b = _int_endpoints(p0, p1, jnp.float32)
    ax0, ay0, bx0, by0 = a[..., 0], a[..., 1], b[..., 0], b[..., 1]
    if thickness <= 1:
        # the compactions clip at t=1 (cv2 semantics), shrinking extents;
        # mirror it so the overflow count matches their eligibility
        ax0, ay0, bx0, by0, draw = _clip_normalize_t1(
            w, h, ax0, ay0, bx0, by0, draw
        )
    # the exact stroke's band/culling radius is wider (stroke_y_extent),
    # so the eligibility count matches the mode actually rendering
    rf = float(_stroke_radius_sq(thickness, stroke)) ** 0.5
    ylo = jnp.minimum(ay0, by0) - rf
    yhi = jnp.maximum(ay0, by0) + rf
    elig = (yhi >= 0.0) & (ylo <= h - 1.0) & draw
    if nxb > 1:
        xlo = jnp.minimum(ax0, bx0) - rf
        xhi = jnp.maximum(ax0, bx0) + rf
        xoff = (jnp.arange(nxb, dtype=jnp.int32) * _XB).astype(jnp.float32)
        touch = (xlo[..., None] <= xoff + (_XB - 1)) & (xhi[..., None] >= xoff)
        n_copies = jnp.sum(elig[..., None] & touch, axis=(1, 2, 3))
    else:
        n_copies = jnp.sum(elig, axis=(1, 2))
    return jnp.maximum(n_copies - max_visible * nxb, 0).astype(jnp.int32)


def rasterize_masks_packed_pallas(
    p0: jnp.ndarray,  # (E, 2) or (B, ..., E, 2) packed edge axis
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (..., E)
    edge_layer: jnp.ndarray,  # (E,) int32 layer id per packed edge
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    max_visible: Optional[int] = None,
    interpret: bool = False,
    layer_bounds: Optional[Tuple[int, ...]] = None,
) -> jnp.ndarray:
    """(..., n_layers, H, W) uint8 masks from a PACKED edge axis (all
    layers' real edges concatenated; see map_compiler packed_* arrays).
    Same output as `rasterize_masks_pallas` on the equivalent padded
    per-layer arrays, but projection-side padding is never scanned.
    """
    return rasterize_masks_packed_pallas_soa(
        p0[..., 0], p0[..., 1], p1[..., 0], p1[..., 1], draw,
        edge_layer, n_layers, resolution, thickness,
        max_visible=max_visible, interpret=interpret,
        layer_bounds=layer_bounds,
    )


def rasterize_masks_packed_pallas_soa(
    u0: jnp.ndarray,  # (..., E) packed edge axis, SoA pixel coords
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    draw: jnp.ndarray,  # (..., E)
    edge_layer: jnp.ndarray,  # (E,) int32 layer id per packed edge
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    max_visible: Optional[int] = None,
    interpret: bool = False,
    layer_bounds: Optional[Tuple[int, ...]] = None,
    out_dtype=jnp.uint8,
    stroke: str = "fast",
) -> jnp.ndarray:
    """SoA-coordinate variant of `rasterize_masks_packed_pallas`: takes
    the projection's unstacked (..., E) coordinate arrays so the whole
    projection -> compaction chain stays fusable (the stacked (..., E, 2)
    point arrays put a 2-extent on the minor/lane axis, which costs XLA
    relayout copies between projection and compaction). A float
    `out_dtype` emits 0/1 masks for in-graph consumers (see
    rasterize_env_idx)."""
    lead = draw.shape[:-1]
    e = draw.shape[-1]
    h, w = resolution
    nxb = _n_xblocks(w)
    # A segment takes one slot copy per touched 128-lane block, so the
    # user-facing budget of `max_visible` SEGMENTS maps to a slot budget
    # of max_visible * nxb copies (a worst-case segment touches every
    # block); narrower segments let more than max_visible fit. (The
    # segment-axis variant with exact segment budgets -- compact_env_seg
    # / rasterize_env_seg -- measured 42% SLOWER fused: the in-kernel
    # block-expansion branches cost more than the halved sort+tail;
    # docs/KERNELS.md round-3.)
    k = e * nxb if max_visible is None else min(max_visible * nxb, e * nxb)
    gran = 16
    u0, v0, u1, v1 = (x.reshape(-1, 1, e) for x in (u0, v0, u1, v1))
    draw = draw.reshape(-1, 1, e)
    if stroke == "exact" and thickness >= 2:
        # Bit-exact cv2 ThickLine stamp. Measured 26.5 vs 7.6 ms fused
        # at the 4096-env reference workload -- the f32 pad probe's
        # "free ops" budget does NOT extend to the stamp's int32
        # multiplies, and the compaction's integer-division chains add
        # 6.5 vs 1.7 ms (docs/KERNELS.md round-4). Still ~4x the tiled
        # XLA fallback and fully on-TPU; the fast stroke remains the
        # throughput default.
        soa = compact_env_exact_soa(
            u0, v0, u1, v1, draw, k, gran, h, thickness,
            edge_layer=edge_layer, n_layers=n_layers, w=w,
            layer_bounds=layer_bounds,
        )
        masks = rasterize_env_exact(
            soa, n_layers, tuple(resolution), thickness, gran=gran,
            split=True, interpret=interpret, out_dtype=out_dtype,
        )
        return masks.reshape(*lead, n_layers, h, w)
    # Index-indirection compaction (no one-hot routing matmul): measured
    # 3.0 -> 1.7 ms compaction / 9.5 -> 8.9 ms fused at the 4096-env
    # reference workload vs compact_env_soa (docs/KERNELS.md round-2).
    # The pre-decoded SoA (TINYCARLO_PREDEC=on) measured a further
    # ~0.07 ms in the proj+compact+kernel A/B but the FULL fused bench
    # program with it dies with a runtime InvalidArgument on the
    # tunneled chip (3/3, both output kernels, chunk 100 and 400, while
    # a 16-step fused repro passes) -- undiagnosed; kept as an opt-in
    # experiment arm, off in production (docs/KERNELS.md round-5).
    soa = compact_env_idx_soa(
        u0, v0, u1, v1, draw, k, gran, h, thickness,
        edge_layer=edge_layer, n_layers=n_layers, w=w,
        layer_bounds=layer_bounds,
        pre=os.environ.get("TINYCARLO_PREDEC", "off") == "on",
    )
    bsz = soa[0].shape[0]
    # Output-path selection: the multi-buffered manual-DMA kernel
    # measured ~4% faster than the blocked-output idx kernel at the
    # 4096-env reference workload after the round-3 split-stroke rework
    # (6.83 vs 7.11 ms proj+compact+kernel, exp_r3c `dma` probe) -- its
    # grouped staging slabs overlap output copies under window compute.
    # The group is bounded by the kernel's SMEM footprint (double-
    # buffered (group, 1, LE) windows per SoA input; 1 MiB SMEM total --
    # knuffingen's LE=3720 overflows at group 8, caught by baseline
    # config 3). Constraints: uint8 output only, batch divisible by the
    # group, h a multiple of 8 (DMA slicing); otherwise the blocked idx
    # path serves. TINYCARLO_OUT=idx forces the old path.
    le = soa[1].shape[-1]
    kp = soa[0].shape[-1]
    group = 8
    while group > 1 and (
        bsz % group or 2 * group * (kp + 7 * le) * 4 > 512 * 1024
    ):
        group //= 2
    # The dma kernel only wins in the many-small-frames regime where a
    # large group amortizes its staging copies (group 8 at 128x160:
    # 6.83 vs 7.11 ms). When SMEM caps the group low (big maps/frames --
    # knuffingen's LE=3720 allows only group 2) it LOSES: 96.3k vs the
    # idx path's 107.1k env-steps/s at 480x640, interleaved A/B. Gate on
    # group >= 4.
    use_dma = (
        jnp.dtype(out_dtype) == jnp.uint8
        and bsz % group == 0
        and group >= 4
        and h % 8 == 0
        and os.environ.get("TINYCARLO_OUT", "dma") == "dma"
    )
    if use_dma:
        masks = rasterize_env_dma(
            soa, n_layers, tuple(resolution), thickness, gran=gran,
            split=True, group=group, nbuf=2, interpret=interpret,
        )
    else:
        masks = rasterize_env_idx(
            soa, n_layers, tuple(resolution), thickness, gran=gran,
            split=True, interpret=interpret, out_dtype=out_dtype,
        )
    return masks.reshape(*lead, n_layers, h, w)


def rasterize_masks_pallas(
    p0: jnp.ndarray,  # (L, E, 2) or (B, ..., L, E, 2)
    p1: jnp.ndarray,
    draw: jnp.ndarray,
    resolution: Tuple[int, int],
    thickness: int = 1,
    max_visible: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of `rasterize.rasterize_masks` (same output up
    to stroke-boundary ulps), batched over any leading dims.

    Uses the env-merged single-pass kernel: `max_visible` budgets drawn
    segments per ENV across all layers (internally one slot copy per
    touched 128-lane block, so the slot count is max_visible *
    ceil(w/128) -- at least max_visible segments always fit); None keeps
    every padded segment slot (exact for any count, with dead slots
    skipped via their zero band count).
    """
    lead = p0.shape[:-3]
    e = p0.shape[-2]
    nl = p0.shape[-3]
    h, w = resolution
    nxb = _n_xblocks(w)
    if max_visible is None:
        k = nl * e * nxb
    else:
        k = min(max_visible * nxb, nl * e * nxb)
    gran = 16
    p0 = p0.reshape(-1, nl, e, 2)
    p1 = p1.reshape(-1, nl, e, 2)
    draw = draw.reshape(-1, nl, e)
    soa = compact_env_idx(p0, p1, draw, k, gran, h, thickness, w=w)
    masks = rasterize_env_idx(
        soa, nl, tuple(resolution), thickness, gran=gran, split=True,
        interpret=interpret,
    )
    return masks.reshape(*lead, nl, h, w)


# ---------------------------------------------------------------------------
# Exact cv2 t >= 2 stroke in the Pallas kernel.
#
# The round-4 pad/NOLOAD/trivial-stamp probes (docs/KERNELS.md) showed
# the window's f32 vector math and SMEM loads hide under per-window
# mechanics -- but the exact stamp's INT32 multiplies do not (int mul
# expands on the VPU), and the compaction's integer-division chains
# (Line2 slopes, chain slopes: C-truncating division emulated in int32)
# cost 6.5 vs 1.7 ms. Net: exact mode measures 26.5 vs 7.6 ms fused at
# the reference workload -- ~4x faster than the tiled XLA fallback and
# entirely on-TPU, shipped as the stroke="exact" path with the fast
# stamp remaining the default. The per-slot scalars are precomputed by
# cv2_stroke.thick_params during compaction and shipped as 30 int32
# SMEM arrays (packed 16-bit pairs where fields fit).
# ---------------------------------------------------------------------------

_XBIAS = 4096  # packing bias so possibly-negative row/col fields stay >= 0


def _pack16(lo, hi):
    """(lo + bias, hi + bias) -> one nonneg int32 (both fields 16-bit)."""
    return (lo + _XBIAS) | ((hi + _XBIAS) << 16)


def compact_env_exact_soa(
    u0: jnp.ndarray,  # (B, L, E) float pixel coords, SoA
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, L, E) bool
    k: int,
    gran: int,
    h: int,
    thickness: int,
    edge_layer: Optional[jnp.ndarray] = None,
    n_layers: Optional[int] = None,
    w: Optional[int] = None,
    layer_bounds: Optional[Tuple[int, ...]] = None,
):
    """Exact-stroke analogue of `compact_env_idx_soa`: same eligibility /
    banding / lane-split / layer-fold / top_k routing, but the per-copy
    payload is the cv2 ThickLine scalar bundle (cv2_stroke.thick_params)
    shifted into block-local / stacked-strip coordinates.

    Returns (idx, arrays, counts): idx (B, kp) int32 slot->copy map,
    `arrays` a 30-tuple of (B, LE) int32, counts as in
    compact_env_idx_soa (row 1, the one-band tier, always 0).
    Array order (consumed positionally by `_tier_loops_exact`):
      0  rowsP   = pack16(ymin_row', stop_row')
      1  brkP    = pack16(brk_a', brk_b')
      2-9  xs1a, dx1a, xs2a, dx2a, xs1b, dx1b, xs2b, dx2b  (fixed point)
      10-13 m0nP per edge = pack16(m0', n)
      14-17 v0 per edge   (fixed point, strip/block shifted)
      18-21 st per edge
      22 capP0 = pack16(cx0', cy0'), 23 capP1
      24-27 fdP per edge = pack16(fdx', fdy') -- the NORMALIZED-far
            endpoint dot of each Line2 edge (where(swap, d0, d1); the
            normalized-near dot coincides with the DDA's k=0 pixel,
            enforced by n = max(n, 1))
      28 flags = fill_ok | acc_e<<1.. | xmaj_e<<5..
      29 bw    (band word, same layout as compact_env_idx_soa)
    """
    from tinycarlo_tpu.ops.cv2_stroke import stroke_y_extent, thick_params

    # The exact-stroke precompute keeps the INPUT float dtype (f64 under
    # the parity/test config): the Line2 scaled clip multiplies 16.16
    # fixed-point coordinates, which f32 cannot carry exactly -- under
    # f32 production the clip can drift one fixed-point ulp on clipped
    # edges (the documented t=1-style caveat).
    fdt = u0.dtype
    lim = fdt.type(1_000_000.0)

    def icast(x):
        return jnp.clip(x, -lim, lim).astype(jnp.int32).astype(fdt)

    ax0, ay0, bx0, by0 = icast(u0), icast(v0), icast(u1), icast(v1)
    bsz, nl, e = ax0.shape

    P = thick_params(ax0, ay0, bx0, by0, thickness, (h, w))
    p0x, p0y = P["cap0x"], P["cap0y"]  # clipped integer endpoints
    p1x, p1y = P["cap1x"], P["cap1y"]
    acc = P["accept"]

    rf = float(stroke_y_extent(thickness))
    n_bands, hp, win = _window_rows(gran, h)
    n_frames = nl if edge_layer is None else n_layers
    nxb = _n_xblocks(w) if w is not None else 1
    assert n_bands < _NB_PACK, "frame too tall for the packed band word"
    assert n_frames * nxb * n_bands < (1 << 24) // _NB_PACK, (
        "stacked frames too tall for band word"
    )
    # Packed-field ranges (advisor round-4 low): _pack16 row fields
    # carry value + roff + _XBIAS (roff <= (n_frames*nxb - 1) * hp,
    # values in [-_XBIAS, h]), and x-major v0 carries (roff + y) << 16
    # in int32 -- the tighter bound. Silent wrap would corrupt the
    # bundle; the band-word asserts above don't cover these.
    assert n_frames * nxb * hp + h + _XBIAS < (1 << 15), (
        "stacked strip rows overflow the packed fields / v0 shift "
        f"(n_frames={n_frames}, nxb={nxb}, hp={hp}, h={h})"
    )
    assert (w if w is not None else 0) + _XBIAS < (1 << 16), (
        f"frame width {w} overflows the packed 16-bit fields"
    )
    yloi = jnp.minimum(p0y, p1y).astype(jnp.float32) - rf
    yhii = jnp.maximum(p0y, p1y).astype(jnp.float32) + rf
    b0 = jnp.clip(jnp.floor(yloi / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    b1 = jnp.clip(jnp.floor(yhii / gran), 0.0, n_bands - 1.0).astype(jnp.int32)
    valid = (yhii >= 0.0) & (yloi <= h - 1.0) & draw & acc
    nb = jnp.where(valid, b1 + 1 - b0, 0)
    b0c = jnp.minimum(b0, (hp - win) // gran)
    if edge_layer is None:
        lay = jax.lax.broadcasted_iota(jnp.int32, draw.shape, 1)
    else:
        lay = jnp.broadcast_to(edge_layer[None, None, :], draw.shape)

    xloi = jnp.minimum(p0x, p1x).astype(jnp.float32) - rf
    xhii = jnp.maximum(p0x, p1x).astype(jnp.float32) + rf

    edges_p = P["edges"]  # list of 4 dicts
    if nxb > 1:
        bidx = jnp.arange(nxb, dtype=jnp.int32)
        xoff = bidx * _XB
        xofff = xoff.astype(jnp.float32)
        touch = (xloi[..., None] <= xofff + (_XB - 1)) & (
            xhii[..., None] >= xofff
        )
        ex = lambda x: jnp.broadcast_to(x[..., None], x.shape + (nxb,))
        nb = jnp.where(touch, nb[..., None], 0)
        b0c = ex(b0c)
        frame = ex(lay) * nxb + bidx
        xs = xoff  # per-copy lane shift
    else:
        ex = lambda x: x
        frame = lay
        xs = jnp.zeros((), jnp.int32)

    roff = frame * hp  # stacked strip row offset, int32
    bw = (frame * n_bands + b0c) * _NB_PACK + nb

    # --- assemble the shifted bundle (broadcast helper `ex` adds the
    # block axis when split) -------------------------------------------------
    xshift16 = (xs << 16) if nxb > 1 else jnp.zeros((), jnp.int32)
    rowsP = _pack16(ex(P["ymin_row"]) + roff, ex(P["stop_row"]) + roff)
    brkP = _pack16(ex(P["brk_a"]) + roff, ex(P["brk_b"]) + roff)
    chains = [
        ex(P["xs1_a"]) - xshift16, ex(P["dx1_a"]),
        ex(P["xs2_a"]) - xshift16, ex(P["dx2_a"]),
        ex(P["xs1_b"]) - xshift16, ex(P["dx1_b"]),
        ex(P["xs2_b"]) - xshift16, ex(P["dx2_b"]),
    ]
    m0n, v0s, sts, d1s = [], [], [], []
    for ed in edges_p:
        xm = ex(ed["xmaj"])
        m0p = jnp.where(xm, ex(ed["m0"]) - xs, ex(ed["m0"]) + roff)
        v0p = jnp.where(
            xm, ex(ed["v0"]) + (roff << 16), ex(ed["v0"]) - xshift16
        )
        # n = max(n, 1): the rounded-start dot coincides with the k=0
        # DDA pixel (same formula), so forcing one pixel realizes it
        # even for major-degenerate clipped edges
        nn = jnp.minimum(jnp.maximum(ed["n"], 1), 32767 - _XBIAS)
        m0n.append(_pack16(m0p, ex(nn)))
        v0s.append(v0p)
        sts.append(ex(ed["st"]))
        # Ship the NORMALIZED-far dot (where(swap, d0, d1)): the k=0 DDA
        # pixel realizes the normalized-near dot, and for direction-
        # swapped clipped edges the far dot is d0 -- shipping d1
        # unconditionally dropped it (advisor round-4 high finding).
        d1s.append(_pack16(ex(ed["fdx"]) - xs, ex(ed["fdy"]) + roff))
    capP0 = _pack16(ex(p0x) - xs, ex(p0y) + roff)
    capP1 = _pack16(ex(p1x) - xs, ex(p1y) + roff)
    flags = ex(
        P["fill_ok"].astype(jnp.int32)
        | (edges_p[0]["acc"].astype(jnp.int32) << 1)
        | (edges_p[1]["acc"].astype(jnp.int32) << 2)
        | (edges_p[2]["acc"].astype(jnp.int32) << 3)
        | (edges_p[3]["acc"].astype(jnp.int32) << 4)
        | (edges_p[0]["xmaj"].astype(jnp.int32) << 5)
        | (edges_p[1]["xmaj"].astype(jnp.int32) << 6)
        | (edges_p[2]["xmaj"].astype(jnp.int32) << 7)
        | (edges_p[3]["xmaj"].astype(jnp.int32) << 8)
    )
    if nxb > 1:
        flags = jnp.broadcast_to(flags, nb.shape)
        rowsP = jnp.broadcast_to(rowsP, nb.shape)
        brkP = jnp.broadcast_to(brkP, nb.shape)
        chains = [jnp.broadcast_to(c, nb.shape) for c in chains]
        m0n = [jnp.broadcast_to(x, nb.shape) for x in m0n]
        v0s = [jnp.broadcast_to(x, nb.shape) for x in v0s]
        sts = [jnp.broadcast_to(x, nb.shape) for x in sts]
        capP0 = jnp.broadcast_to(capP0, nb.shape)
        capP1 = jnp.broadcast_to(capP1, nb.shape)

    arrays = [rowsP, brkP, *chains, *m0n, *v0s, *sts, capP0, capP1,
              *d1s, flags, bw]

    le = nl * e * nxb
    flat = lambda x: x.reshape(bsz, le)
    arrays = tuple(flat(x) for x in arrays)
    draw2 = flat(nb > 0)
    tall = flat(nb > win // gran)

    iota = jax.lax.broadcasted_iota(jnp.int32, (bsz, le), 1)
    key = jnp.where(draw2, jnp.where(tall, le - iota, 2 * le - iota), -iota)
    n_elig = jnp.sum(draw2, axis=-1).astype(jnp.int32)
    n_all = jnp.minimum(n_elig, k)
    n_short = jnp.minimum(jnp.sum(draw2 & ~tall, axis=-1), k).astype(
        jnp.int32
    )
    n_drop = n_elig - n_all

    if k < le:
        kdt = (jnp.float32 if os.environ.get("TINYCARLO_SORTKEY") == "f32"
               else jnp.int32)
        _, idx = jax.lax.top_k(key.astype(kdt), k)
    else:
        idx = jnp.argsort(-key, axis=-1).astype(jnp.int32)
    idx = jnp.concatenate([idx] + [idx[:, -1:]] * 7, axis=-1)

    n_out_layers = nl if edge_layer is None else n_layers
    if edge_layer is None:
        bounds = tuple(range(0, (nl + 1) * e, e))
    else:
        bounds = layer_bounds
    if bounds is not None and len(bounds) == n_out_layers + 1:
        per_layer = jnp.stack(
            [
                jnp.sum(
                    draw2[:, bounds[l] * nxb: bounds[l + 1] * nxb],
                    axis=-1, dtype=jnp.int32,
                )
                for l in range(n_out_layers)
            ],
            axis=-1,
        )
    else:
        lay_flat = flat(jnp.broadcast_to(
            lay[..., None] if nxb > 1 else lay, nb.shape))
        onehot_l = lay_flat[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (bsz, n_out_layers, le), 1
        )
        per_layer = jnp.sum(
            draw2[:, None, :] & onehot_l, axis=-1, dtype=jnp.int32
        )
    zero = jnp.zeros_like(n_all)
    counts = jnp.concatenate(
        [jnp.stack([n_all, zero, n_short, n_drop]), per_layer.T], axis=0
    )
    return idx, arrays, counts


def _tier_loops_exact(load, scratch, n, n_short, wb, thickness, gran, win):
    """Two-tier slot loops with the BIT-EXACT cv2 ThickLine window stamp.

    `load(s)` returns the 30-tuple from `compact_env_exact_soa` for slot
    s's copy. The predicate reproduces ops/cv2_stroke.thick_hit in
    int32 window arithmetic: scanfill spans from the two chain
    interpolations, four Line2 DDA predicates (+ their far-endpoint
    dots; the near dot is the k=0 DDA pixel), and the two cap circles
    via the static half-width table. All values arrive pre-shifted into
    block-local lane / stacked-strip coordinates, so `xi` is the lane
    iota and `yi` the strip row."""
    from tinycarlo_tpu.ops.cv2_stroke import cap_radius, cap_table

    wtab = cap_table(cap_radius(thickness))
    xs16 = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 1)
    ys16 = jax.lax.broadcasted_iota(jnp.int32, (win, wb), 0)
    xs8 = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 1)
    ys8 = jax.lax.broadcasted_iota(jnp.int32, (gran, wb), 0)

    def unpack(p):
        return (p & 0xFFFF) - _XBIAS, (p >> 16) - _XBIAS

    def stamp(xi, ysr, rows, y0, vals, live):
        (rowsP, brkP,
         xs1a, dx1a, xs2a, dx2a, xs1b, dx1b, xs2b, dx2b,
         m0n0, m0n1, m0n2, m0n3,
         v00, v01, v02, v03,
         st0, st1, st2, st3,
         capP0, capP1, d1P0, d1P1, d1P2, d1P3, flags, _bw) = vals
        yi = ysr + y0  # strip rows, int32 (rows, wb)
        ymin, ystop = unpack(rowsP)
        brka, brkb = unpack(brkP)
        ya = yi - ymin
        x_a = jnp.where(
            yi < brka, xs1a + dx1a * ya, xs2a + dx2a * (yi - brka)
        )
        x_b = jnp.where(
            yi < brkb, xs1b + dx1b * ya, xs2b + dx2b * (yi - brkb)
        )
        lo = (jnp.minimum(x_a, x_b) + HALF16) >> 16
        hi = (jnp.maximum(x_a, x_b) + HALF16) >> 16
        hit = (
            ((flags & 1) > 0)
            & (yi >= ymin) & (yi <= ystop) & (xi >= lo) & (xi <= hi)
        )
        for i, (m0n, v0, st, d1P) in enumerate((
            (m0n0, v00, st0, d1P0), (m0n1, v01, st1, d1P1),
            (m0n2, v02, st2, d1P2), (m0n3, v03, st3, d1P3),
        )):
            acc = ((flags >> (1 + i)) & 1) > 0
            xmaj = ((flags >> (5 + i)) & 1) > 0
            m0, nn = unpack(m0n)
            kk = jnp.where(xmaj, xi, yi) - m0
            mino = jnp.where(xmaj, yi, xi)
            val = (v0 + kk * st) >> 16
            hit = hit | (acc & (kk >= 0) & (kk < nn) & (mino == val))
            d1x, d1y = unpack(d1P)
            hit = hit | (acc & (xi == d1x) & (yi == d1y))
        for capP in (capP0, capP1):
            cx, cy = unpack(capP)
            m = jnp.abs(yi - cy)
            hw = jnp.full_like(m, -1)
            for off, half_w in enumerate(wtab):
                hw = jnp.where(m == off, half_w, hw)
            hit = hit | (jnp.abs(xi - cx) <= hw)
        hit = hit & live
        # f32 scratch, masked store (as the fast stamp)
        pltpu.store(
            scratch.at[pl.ds(y0, rows), pl.ds(y0 * 0, scratch.shape[-1])],
            jnp.full((rows, scratch.shape[-1]), 255.0, jnp.float32),
            mask=hit,
        )

    def win16(s):
        vals = load(s)
        bw = vals[-1]
        # shift/mask decode on the scalar unit (see _tier_loops._decode)
        b0 = jax.lax.shift_right_logical(bw, jnp.asarray(_NB_SHIFT, bw.dtype))
        nb = bw & (_NB_PACK - 1)
        stamp(xs16, ys16, win, b0 * gran, vals, nb > 0)
        return vals, b0, nb

    import os as _os
    unroll = int(_os.environ.get("TINYCARLO_UNROLL", 8))

    def pack(p, _):
        for u in range(unroll):
            win16(unroll * p + u)
        return 0

    jax.lax.fori_loop(0, (n_short + unroll - 1) // unroll, pack, 0)

    def tall_one(s, _):
        vals, b0, nb = win16(s)

        def tail(bi, _):
            stamp(xs8, ys8, gran, bi * gran, vals, nb > 0)
            return 0

        jax.lax.fori_loop(b0 + win // gran, b0 + nb, tail, 0)
        return 0

    jax.lax.fori_loop(n_short, n, tall_one, 0)


HALF16 = 1 << 15


def _kernel_env_exact(
    count_ref,
    idx_ref,
    *rest,
    n_layers,
    h,
    hp,
    w,
    thickness,
    gran,
    win,
    nxb,
    out_dtype=jnp.uint8,
):
    """Env-merged blocked-output kernel with the exact cv2 stroke stamp
    (see `_tier_loops_exact`). Structure mirrors `_kernel_env_idx` at
    group=1."""
    refs = rest[:-2]
    out_ref, scratch = rest[-2], rest[-1]
    wb = _XB if nxb > 1 else w
    i = pl.program_id(0)
    as_uint8 = out_dtype == jnp.uint8

    n = count_ref[0, i]
    n_short = count_ref[2, i]

    @pl.when(n == 0)
    def _empty():
        for l in range(n_layers):
            out_ref[0, l] = jnp.zeros((h, w), out_dtype)

    @pl.when(n > 0)
    def _live():
        for l in range(n_layers):
            @pl.when(count_ref[4 + l, i] > 0)
            def _zero_strip(l=l):
                scratch[l * nxb * hp: (l + 1) * nxb * hp] = jnp.zeros(
                    (nxb * hp, wb), jnp.float32
                )

        def load(s):
            e = idx_ref[0, 0, s]
            return tuple(r[0, 0, e] for r in refs)

        _tier_loops_exact(load, scratch, n, n_short, wb, thickness,
                          gran, win)
        for l in range(n_layers):
            liv = count_ref[4 + l, i] > 0

            @pl.when(liv)
            def _convert(l=l):
                if nxb == 1:
                    frame = scratch[l * hp: l * hp + h]
                else:
                    strips = [
                        scratch[(l * nxb + bl) * hp: (l * nxb + bl) * hp + h]
                        for bl in range(nxb)
                    ]
                    frame = jnp.concatenate(strips, axis=1)[:, :w]
                if as_uint8:
                    out_ref[0, l] = frame.astype(jnp.int32).astype(jnp.uint8)
                else:
                    out_ref[0, l] = frame.astype(out_dtype)

            @pl.when(jnp.logical_not(liv))
            def _zero(l=l):
                out_ref[0, l] = jnp.zeros((h, w), out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_layers", "resolution", "thickness", "gran", "split",
        "interpret", "out_dtype",
    ),
)
def rasterize_env_exact(
    soa,  # from compact_env_exact_soa
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int,
    gran: int = 16,
    split: bool = True,
    interpret: bool = False,
    out_dtype=jnp.uint8,
) -> jnp.ndarray:
    """(B, L, H, W) masks via the exact-stroke kernel."""
    idx, arrays, counts = soa
    h, w = resolution
    bsz, le = arrays[0].shape
    kp = idx.shape[-1]
    _, hp, win = _window_rows(gran, h)
    nxb = _n_xblocks(w) if split else 1
    out_dtype = jnp.dtype(out_dtype)
    kernel = functools.partial(
        _kernel_env_exact,
        n_layers=n_layers,
        h=h,
        hp=hp,
        w=w,
        thickness=int(thickness),
        gran=gran,
        win=win,
        nxb=nxb,
        out_dtype=out_dtype,
    )
    smem_idx = pl.BlockSpec(
        (1, 1, kp), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    smem_soa = pl.BlockSpec(
        (1, 1, le), lambda i, c: (i, 0, 0), memory_space=pltpu.SMEM
    )
    wb = _XB if nxb > 1 else w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[smem_idx] + [smem_soa] * len(arrays),
        out_specs=pl.BlockSpec(
            (1, n_layers, h, w), lambda i, c: (i, 0, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((n_layers * nxb * hp, wb), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n_layers, h, w), out_dtype),
        interpret=interpret,
    )(
        counts,
        idx.reshape(bsz, 1, kp),
        *(x.reshape(bsz, 1, le) for x in arrays),
    )
