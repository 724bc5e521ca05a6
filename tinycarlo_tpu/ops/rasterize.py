"""Line-segment rasterization into class masks / RGB frames.

TPU-native replacement for the reference's cv2.polylines rasterization
(reference: tinycarlo/renderer.py:36-51). Segments are drawn by a
distance-to-segment test against the pixel grid -- a branch-free,
fixed-shape formulation that vmaps over envs and lowers to dense VPU code.

Endpoint handling matches cv2: coordinates are truncated toward zero to
integers before drawing (the reference passes np.int32(...) pairs,
renderer.py:41-43,48-50). Thickness t paints pixels whose center lies
within the stroke radius of the integer segment; the radius is calibrated
against cv2's 8-connected thick lines (see tests/test_rasterize.py for the
measured agreement).

Three implementations:
  * `rasterize_masks` -- pure jnp dense test, the readable reference.
  * `rasterize_masks_tiled` -- same math evaluated tile-by-tile with
    per-tile segment culling (bit-equal; CPU/portable path).
  * `tinycarlo_tpu.ops.rasterize_pallas` -- TPU Pallas kernel that loops
    only over the visible segments (dynamic trip count); selected by
    `rasterize_masks_auto` on TPU backends.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _effective_platform() -> str:
    """Platform the next computation will actually run on: honors an
    active `jax.default_device(...)` context (the gym shim pins itself
    to host CPU this way) before falling back to the process default
    backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def _split_radii(thickness: int) -> Tuple[float, float]:
    """cv2-calibrated stroke geometry for t >= 2 (cv2 ThickLine draws a
    subpixel-exact filled rectangle + end-cap ellipses, drawing.cpp):
    lateral halfwidth ceil(t/2)+0.5 (the +0.5 absorbs the scanline-fill
    pixel convention), cap radius ceil(t/2). Fitted against cv2.polylines
    over random segments: mismatched-pixel fractions 10.9% (t=2), 6.4%
    (t=3), 5.7% (t=4), 3.4% (t=5) -- vs 11.7/18.5/7.3/13.3% for the old
    single-disc radius (t+1)/2. t=1 is NOT a disc at all (see
    _bresenham_hit)."""
    if thickness <= 1:
        return 0.5, 0.5
    half = math.ceil(thickness / 2)
    return half + 0.5, float(half)


def _stroke_radius_sq(thickness: int, stroke: str = "fast") -> float:
    """Squared band-extent radius (the largest distance at which any pixel
    can be painted) -- used for tile/band culling and compaction extents."""
    if stroke == "exact" and thickness >= 2:
        from tinycarlo_tpu.ops.cv2_stroke import stroke_y_extent

        r = stroke_y_extent(thickness)
        return r * r
    r = _split_radii(thickness)[0]
    return r * r


def _clip_line_cv2(w: int, h: int, x1, y1, x2, y2):
    """Vectorized bit-exact replica of cv2 clipLine (drawing.cpp): clip
    pt1 then pt2 against the y range (using the already-updated pt1),
    then the same against x; intermediate coordinates computed in double
    with truncation toward zero -- exactly cv2's arithmetic, so under
    float64 the results match cv2 bit for bit (verified 20k random
    segments incl. |coord| up to 1e9). Inputs are int-valued float
    arrays; returns (x1, y1, x2, y2, accept)."""
    dtype = x1.dtype
    right = dtype.type(w - 1)
    bottom = dtype.type(h - 1)
    zero = dtype.type(0)

    def code(x, y):
        return (
            (x < 0).astype(jnp.int32)
            + 2 * (x > right).astype(jnp.int32)
            + 4 * (y < 0).astype(jnp.int32)
            + 8 * (y > bottom).astype(jnp.int32)
        )

    def tdiv(num, den):
        return jnp.trunc(num / jnp.where(den == 0, dtype.type(1), den))

    c1 = code(x1, y1)
    c2 = code(x2, y2)
    active = ((c1 & c2) == 0) & ((c1 | c2) != 0)

    do = active & ((c1 & 12) != 0)
    a = jnp.where(c1 < 8, zero, bottom)
    x1n = x1 + tdiv((a - y1) * (x2 - x1), y2 - y1)
    x1 = jnp.where(do, x1n, x1)
    y1 = jnp.where(do, a, y1)
    c1 = jnp.where(
        do, (x1 < 0).astype(jnp.int32) + 2 * (x1 > right).astype(jnp.int32), c1
    )

    do = active & ((c2 & 12) != 0)
    a = jnp.where(c2 < 8, zero, bottom)
    x2n = x2 + tdiv((a - y2) * (x2 - x1), y2 - y1)
    x2 = jnp.where(do, x2n, x2)
    y2 = jnp.where(do, a, y2)
    c2 = jnp.where(
        do, (x2 < 0).astype(jnp.int32) + 2 * (x2 > right).astype(jnp.int32), c2
    )

    active = ((c1 & c2) == 0) & ((c1 | c2) != 0)
    do = active & (c1 != 0)
    a = jnp.where(c1 == 1, zero, right)
    y1n = y1 + tdiv((a - x1) * (y2 - y1), x2 - x1)
    y1 = jnp.where(do, y1n, y1)
    x1 = jnp.where(do, a, x1)
    c1 = jnp.where(do, 0, c1)

    do = active & (c2 != 0)
    a = jnp.where(c2 == 1, zero, right)
    y2n = y2 + tdiv((a - x2) * (y2 - y1), x2 - x1)
    y2 = jnp.where(do, y2n, y2)
    x2 = jnp.where(do, a, x2)
    c2 = jnp.where(do, 0, c2)

    return x1, y1, x2, y2, (c1 & c2) == 0


def _bresenham_hit(px, py, x1, y1, x2, y2, accept):
    """Per-pixel predicate for cv2's thickness-1 line: the 8-connected
    DDA of LineIterator (drawing.cpp, leftToRight, connectivity 8) in
    closed form. Anchored at the smaller-x endpoint; along the major
    axis step i, the minor coordinate is floor((2*minor_extent*i +
    major_extent - 1) / (2*major_extent)) -- the -1 reproduces cv2's
    round-half-toward-anchor tie behavior. With float64 inputs (post
    _clip_line_cv2) this is bit-exact vs cv2.line: 0 mismatches over 5k
    random + 3k huge-coordinate + 10k exhaustive small-grid segments.
    Float32 is exact too once coordinates are in-frame (products stay
    below 2^24; a residual correction keeps the floor division exact).
    """
    dtype = px.dtype
    swap = x2 < x1
    ax = jnp.where(swap, x2, x1)
    ay = jnp.where(swap, y2, y1)
    bx = jnp.where(swap, x1, x2)
    by = jnp.where(swap, y1, y2)
    dx = bx - ax
    dy = by - ay
    sy = jnp.where(dy >= 0, dtype.type(1), dtype.type(-1))
    ady = jnp.abs(dy)
    xmaj = dx >= ady
    maj = jnp.where(xmaj, dx, ady)
    mino = jnp.where(xmaj, ady, dx)
    step = jnp.where(xmaj, px - ax, sy * (py - ay))
    num = 2 * mino * step + maj - 1
    den = 2 * maj
    q = jnp.floor(num / jnp.where(den == 0, dtype.type(1), den))
    # float32 floor-division safety: correct off-by-one via the exact
    # integer residual (all operands integer-valued, < 2^24 in-frame)
    r = num - q * den
    q = q + (r >= den).astype(dtype) - (r < 0).astype(dtype)
    minor_coord = jnp.where(xmaj, ay + sy * q, ax + q)
    probe = jnp.where(xmaj, py, px)
    inrange = (step >= 0) & (step <= maj)
    hit = inrange & (probe == minor_coord)
    point = (dx == 0) & (ady == 0)
    hit = jnp.where(point, (px == ax) & (py == ay), hit)
    return hit & accept


def _segment_dist_sq(px, py, ax, ay, bx, by):
    """Squared distance from points (px,py) to segments (a,b).

    Shapes broadcast: pixel coords (..., 1) against segment coords (E,).
    """
    abx = bx - ax
    aby = by - ay
    apx = px - ax
    apy = py - ay
    denom = abx * abx + aby * aby
    t = (apx * abx + apy * aby) / jnp.where(denom == 0, 1.0, denom)
    t = jnp.clip(t, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return dx * dx + dy * dy


def _int_endpoints(p0: jnp.ndarray, p1: jnp.ndarray, dtype):
    """cv2-style int32 truncation of endpoints, clamped to a sane window so
    near-plane-clipped points (|coord| up to ~1e9) stay finite in float32.
    """
    lim = 1_000_000.0
    a = jnp.clip(p0, -lim, lim).astype(jnp.int32).astype(dtype)
    b = jnp.clip(p1, -lim, lim).astype(jnp.int32).astype(dtype)
    return a, b


def _segment_hit(px, py, ax, ay, bx, by, thickness: int, resolution,
                 stroke: str = "fast"):
    """Per-(pixel, segment) hit predicate matching cv2 stroke semantics:
    exact clipLine + 8-connected Bresenham at thickness 1 (bit-exact vs
    cv2.line under float64, either stroke mode); at t >= 2 either the
    calibrated rectangle-body + end-cap stroke (stroke="fast",
    _split_radii) or the bit-exact cv2 ThickLine replica
    (stroke="exact", ops/cv2_stroke.py -- fill scanlines + Line2
    outlines + circle caps, bit-equal to cv2.polylines under float64).
    Pixel coords broadcast against segment coords."""
    dtype = px.dtype
    if stroke == "exact" and thickness >= 2:
        from tinycarlo_tpu.ops.cv2_stroke import thick_hit, thick_params

        params = thick_params(ax, ay, bx, by, thickness, resolution)
        return thick_hit(px, py, params, thickness)
    if thickness <= 1:
        cx1, cy1, cx2, cy2, acc = _clip_line_cv2(
            resolution[1], resolution[0], ax, ay, bx, by
        )
        return _bresenham_hit(px, py, cx1, cy1, cx2, cy2, acc)
    lat, cap = _split_radii(thickness)
    abx = bx - ax
    aby = by - ay
    apx = px - ax
    apy = py - ay
    denom = abx * abx + aby * aby
    tt = (apx * abx + apy * aby) / jnp.where(denom == 0, dtype.type(1), denom)
    tc = jnp.clip(tt, 0, 1)
    dxv = apx - tc * abx
    dyv = apy - tc * aby
    d2 = dxv * dxv + dyv * dyv
    r2 = jnp.where(
        (tt >= 0) & (tt <= 1),
        dtype.type(lat * lat),
        dtype.type(cap * cap),
    )
    return d2 <= r2


def rasterize_masks(
    p0: jnp.ndarray,  # (L, E, 2) float pixel coords (u=x, v=y)
    p1: jnp.ndarray,  # (L, E, 2)
    draw: jnp.ndarray,  # (L, E) bool
    resolution: Tuple[int, int],
    thickness: int = 1,
    stroke: str = "fast",
) -> jnp.ndarray:
    """Rasterize per-layer segments into (L, H, W) uint8 {0,255} masks.

    Equivalent of reference render_camera_frame_classes
    (renderer.py:46-51). Dense O(H*W*E) stroke test (`_segment_hit`); use
    the tiled variant for throughput.
    """
    h, w = resolution
    dtype = p0.dtype
    a, b = _int_endpoints(p0, p1, dtype)

    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)

    def one_layer(a_l, b_l, draw_l):
        hit = _segment_hit(
            xs[..., None],
            ys[..., None],
            a_l[:, 0],
            a_l[:, 1],
            b_l[:, 0],
            b_l[:, 1],
            thickness,
            resolution,
            stroke,
        )  # (H, W, E)
        hit = jnp.any(hit & draw_l, axis=-1)
        return jnp.where(hit, jnp.uint8(255), jnp.uint8(0))

    return jax.vmap(one_layer)(a, b, draw)


def rasterize_rgb(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    draw: jnp.ndarray,
    colors: jnp.ndarray,  # (L, 3) int32 RGB
    resolution: Tuple[int, int],
    thickness: int = 1,
    masks: jnp.ndarray = None,
    stroke: str = "fast",
) -> jnp.ndarray:
    """Composite per-layer masks into an (H, W, 3) uint8 RGB frame.

    Layers are painted in order, later layers overwriting earlier ones at
    overlaps, matching cv2's sequential polylines (renderer.py:36-44).
    """
    if masks is None:
        masks = rasterize_masks(p0, p1, draw, resolution, thickness,
                                stroke=stroke)
    h, w = resolution
    frame = jnp.zeros((h, w, 3), dtype=jnp.uint8)
    colors = colors.astype(jnp.uint8)
    for i in range(masks.shape[0]):
        frame = jnp.where(masks[i][..., None] > 0, colors[i], frame)
    return frame


def rgb_from_rank(rank: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) uint8 layer-rank map (0 = background, l+1 = layer l
    painted last) -> (..., H, W, 3) uint8 rgb. Bit-identical to
    `rasterize_rgb`'s sequential composite: cv2 paints layers in index
    order with later layers overwriting (renderer.py:41-43), which is
    exactly "highest rank wins". Used with the TPU rank kernel
    (rasterize_pallas.rasterize_rank_packed_soa), which writes 1/5th the
    output bytes of the per-layer masks."""
    frame = jnp.zeros(rank.shape + (3,), jnp.uint8)
    colors = colors.astype(jnp.uint8)
    for l in range(colors.shape[0]):
        frame = jnp.where((rank == l + 1)[..., None], colors[l], frame)
    return frame


def rank_from_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """(..., L, H, W) class masks -> (..., H, W) uint8 layer-rank map.

    0 = background, l+1 = layer l painted last (cv2 paints layers in
    index order with later layers overwriting, renderer.py:41-43, so the
    highest set layer index wins). Dense/CPU counterpart of the TPU rank
    kernel (rasterize_pallas.rasterize_rank_packed_soa) and the decode
    target of `rgb_from_rank`/`classes_from_rank`; the paint-order
    observation contract for `observation_space_format: "rank"` (1/(3L)
    of the rgb bytes, 1/L of classes)."""
    L = masks.shape[-3]
    ranks = jnp.arange(1, L + 1, dtype=jnp.uint8).reshape((L, 1, 1))
    return jnp.max(
        jnp.where(masks > 0, ranks, jnp.uint8(0)), axis=-3
    )


def classes_from_rank(rank: jnp.ndarray, n_layers: int,
                      out_dtype=jnp.uint8) -> jnp.ndarray:
    """(..., H, W) rank map -> (..., L, H, W) one-hot class masks.

    Inverse of `rank_from_masks` up to paint order: where layers overlap
    only the LAST-painted layer's channel is set (the rank map stores one
    layer per pixel -- the same information an rgb frame carries,
    renderer.py:41-43). uint8 emits the env contract's 0/255; float
    dtypes emit 0/1 for in-graph consumers (e.g. an encoder feed)."""
    L = n_layers
    ids = jnp.arange(1, L + 1, dtype=rank.dtype).reshape((L, 1, 1))
    hit = rank[..., None, :, :] == ids
    one = 255 if jnp.dtype(out_dtype) == jnp.uint8 else 1
    return jnp.where(hit, one, 0).astype(out_dtype)


def rgb_planar_from_rank(rank, colors) -> "jnp.ndarray":
    """(..., H, W) uint8 rank map -> (..., 3, H, W) uint8 PLANAR rgb.

    Same pixel values as `rgb_from_rank` transposed; built channel-wise
    (each channel is a full-lane-width select over the rank map), so the
    output materializes in the lane-friendly planar layout. The HWC
    (H, W, 3) layout materializes at only 11-19 GB/s on v5e (bare XLA
    fill probe, docs/KERNELS.md round-4) vs ~150-230 GB/s planar -- the
    planar contract is the throughput rgb format for in-graph consumers
    (`observation_space_format: rgb_planar`)."""
    colors = colors.astype(jnp.uint8)
    chans = []
    for c in range(3):
        ch = jnp.zeros(rank.shape, jnp.uint8)
        for l in range(colors.shape[0]):
            ch = jnp.where(rank == l + 1, colors[l, c], ch)
        chans.append(ch)
    return jnp.stack(chans, axis=-3)


def rasterize_rgb_planar(masks, colors) -> "jnp.ndarray":
    """(..., L, H, W) masks -> (..., 3, H, W) uint8 planar rgb (paint
    order = layer order, matching `rasterize_rgb`)."""
    colors = colors.astype(jnp.uint8)
    chans = []
    for c in range(3):
        ch = jnp.zeros(masks.shape[:-3] + masks.shape[-2:], jnp.uint8)
        for l in range(colors.shape[0]):
            ch = jnp.where(masks[..., l, :, :] > 0, colors[l, c], ch)
        chans.append(ch)
    return jnp.stack(chans, axis=-3)


def compact_visible(
    p0: jnp.ndarray,  # (..., E, 2) float pixel coords
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (..., E) bool
    k: int,
):
    """top_k-compact the drawn segments into the first `count` of k slots.

    Returns (a, b, live, count): (..., k, 2) int-valued endpoints (cv2
    truncation already applied), (..., k) bool slot-live mask, and (...,)
    int32 live counts. Order among drawn segments is preserved (the sort
    key is strictly decreasing in the original index), which keeps cv2's
    paint order; for same-value mask painting order is irrelevant anyway.

    Masks are unchanged by compaction as long as every frame has at most
    k drawn segments; with more, the later segments (in layer order) are
    dropped. Callers pick k from the map/camera geometry (see
    CameraConfig.max_visible_segments).
    """
    e = draw.shape[-1]
    a, b = _int_endpoints(p0, p1, p0.dtype)
    if k >= e:
        return a, b, draw, jnp.sum(draw, axis=-1).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, draw.shape, draw.ndim - 1)
    # Distinct keys, monotone in index within the drawn and undrawn
    # groups: stable prefix without relying on top_k tie-breaking.
    key = jnp.where(draw, e - iota, -iota)
    _, idx = jax.lax.top_k(key, k)
    a = jnp.take_along_axis(a, idx[..., None], axis=-2)
    b = jnp.take_along_axis(b, idx[..., None], axis=-2)
    count = jnp.minimum(jnp.sum(draw, axis=-1), k).astype(jnp.int32)
    live = jax.lax.broadcasted_iota(jnp.int32, count.shape + (k,), draw.ndim - 1)
    live = live < count[..., None]
    return a, b, live, count


def rasterize_masks_auto(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    draw: jnp.ndarray,
    resolution: Tuple[int, int],
    thickness: int = 1,
    max_visible: int = None,
    stroke: str = "fast",
) -> jnp.ndarray:
    """Backend dispatch: the Pallas visible-segment kernel on TPU, the
    tiled jnp formulation elsewhere (trace-time decision; both agree up
    to stroke-boundary ulps, see rasterize_pallas). Accepts (L, E, 2) or
    batched (B, ..., L, E, 2) segment arrays. `max_visible` bounds the
    number of drawn segments per layer-frame (see compact_visible); on
    CPU it compacts the segment axis before the dense tile test."""
    if _effective_platform() == "tpu" and not (
        stroke == "exact" and thickness >= 2
    ):
        # the Pallas stamps implement the fast stroke (and the exact
        # t=1 Bresenham); exact t>=2 routes through the tiled XLA path
        # below on every backend (correctness-first opt-in mode)
        from tinycarlo_tpu.ops.rasterize_pallas import rasterize_masks_pallas

        return rasterize_masks_pallas(
            p0, p1, draw, resolution, thickness, max_visible=max_visible
        )
    if max_visible is not None and max_visible < p0.shape[-2]:
        p0, p1, draw, _ = compact_visible(p0, p1, draw, max_visible)
    fn = rasterize_masks_tiled
    for _ in range(p0.ndim - 3):
        fn = jax.vmap(fn, in_axes=(0, 0, 0, None, None, None))
    return fn(p0, p1, draw, resolution, thickness, stroke)


def rasterize_masks_packed_auto(
    p0: jnp.ndarray,  # (..., E, 2) packed edge axis (all layers concat)
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (..., E)
    edge_layer: jnp.ndarray,  # (E,) int32
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    max_visible: int = None,
    layer_bounds: Tuple[int, ...] = None,
    stroke: str = "fast",
) -> jnp.ndarray:
    """Packed-edge-axis variant of `rasterize_masks_auto` (see
    map_compiler packed_* arrays): (..., n_layers, H, W) masks. On TPU
    this feeds the env-merged Pallas kernel directly; elsewhere the
    packed axis is expanded to per-layer draw masks (broadcast views,
    no materialized copies) for the tiled path."""
    if _effective_platform() == "tpu" and not (
        stroke == "exact" and thickness >= 2
    ):
        from tinycarlo_tpu.ops.rasterize_pallas import (
            rasterize_masks_packed_pallas,
        )

        return rasterize_masks_packed_pallas(
            p0, p1, draw, edge_layer, n_layers, resolution, thickness,
            max_visible=max_visible, layer_bounds=layer_bounds,
        )
    e = edge_layer.shape[0]
    lay = edge_layer[None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (n_layers, e), 0
    )  # (L, E)
    draw_l = draw[..., None, :] & lay
    p0_l = jnp.broadcast_to(p0[..., None, :, :], draw_l.shape + (2,))
    p1_l = jnp.broadcast_to(p1[..., None, :, :], draw_l.shape + (2,))
    return rasterize_masks_auto(
        p0_l, p1_l, draw_l, resolution, thickness, max_visible=max_visible,
        stroke=stroke,
    )


def rasterize_masks_packed_auto_soa(
    u0: jnp.ndarray,  # (..., E) packed edge axis, SoA pixel coords
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    draw: jnp.ndarray,  # (..., E)
    edge_layer: jnp.ndarray,  # (E,) int32
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int = 1,
    max_visible: int = None,
    layer_bounds: Tuple[int, ...] = None,
    out_dtype=jnp.uint8,
    stroke: str = "fast",
) -> jnp.ndarray:
    """`rasterize_masks_packed_auto` taking the projection's unstacked
    coordinate arrays: on TPU the SoA flows straight into compaction
    (no (..., E, 2) stack whose minor-2 layout costs relayout copies);
    elsewhere the coordinates are stacked for the dense fallback.
    `out_dtype=uint8` gives 0/255 observation masks; a float dtype gives
    0/1 masks for in-graph consumers (skips the uint8 materialization on
    TPU; the fallback converts after the fact, same values)."""
    if _effective_platform() == "tpu":
        from tinycarlo_tpu.ops.rasterize_pallas import (
            rasterize_masks_packed_pallas_soa,
        )

        # stroke="exact" routes the bit-exact cv2 ThickLine kernel stamp
        # (rasterize_pallas.compact_env_exact_soa / rasterize_env_exact)
        return rasterize_masks_packed_pallas_soa(
            u0, v0, u1, v1, draw, edge_layer, n_layers, resolution,
            thickness, max_visible=max_visible, layer_bounds=layer_bounds,
            out_dtype=out_dtype, stroke=stroke,
        )
    p0 = jnp.stack([u0, v0], axis=-1)
    p1 = jnp.stack([u1, v1], axis=-1)
    masks = rasterize_masks_packed_auto(
        p0, p1, draw, edge_layer, n_layers, resolution, thickness,
        max_visible=max_visible, layer_bounds=layer_bounds, stroke=stroke,
    )
    if jnp.dtype(out_dtype) != jnp.uint8:
        masks = (masks > 0).astype(out_dtype)
    return masks


def rasterize_masks_tiled(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    draw: jnp.ndarray,
    resolution: Tuple[int, int],
    thickness: int = 1,
    stroke: str = "fast",
    tile_h: int = 8,
) -> jnp.ndarray:
    """Tiled rasterizer with per-row-tile segment culling.

    The image is cut into (tile_h, W) row bands; a segment contributes to a
    band only if its y-extent (padded by the stroke radius) overlaps it.
    The distance test is still evaluated for every (pixel, segment) pair in
    the band but multiplied by the cull mask, which XLA turns into cheap
    vector selects; the win comes from the much smaller live segment count
    after the visibility mask upstream zeros most rows. Produces bit-equal
    output to `rasterize_masks`.
    """
    h, w = resolution
    dtype = p0.dtype
    a, b = _int_endpoints(p0, p1, dtype)
    r = math.sqrt(_stroke_radius_sq(thickness, stroke))
    n_tiles = (h + tile_h - 1) // tile_h

    ys = jax.lax.broadcasted_iota(dtype, (tile_h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (tile_h, w), 1)

    def one_layer(a_l, b_l, draw_l):
        # y-extent culling from the UNCLIPPED endpoints: clipping (t=1)
        # only ever shrinks a segment, so this stays a superset.
        ymin = jnp.minimum(a_l[:, 1], b_l[:, 1]) - r
        ymax = jnp.maximum(a_l[:, 1], b_l[:, 1]) + r

        def one_tile(t):
            y0 = t * tile_h
            live = draw_l & (ymax >= y0) & (ymin < y0 + tile_h)
            hit = _segment_hit(
                xs[..., None],
                ys[..., None] + y0,
                a_l[:, 0],
                a_l[:, 1],
                b_l[:, 0],
                b_l[:, 1],
                thickness,
                resolution,
                stroke,
            )
            hit = jnp.any(hit & live, axis=-1)
            return jnp.where(hit, jnp.uint8(255), jnp.uint8(0))

        tiles = jax.vmap(one_tile)(jnp.arange(n_tiles))
        return tiles.reshape(n_tiles * tile_h, w)[:h]

    return jax.vmap(one_layer)(a, b, draw)
