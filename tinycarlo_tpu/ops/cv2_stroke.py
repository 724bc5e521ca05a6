"""Exact cv2 thick-stroke (thickness >= 2) semantics.

The reference rasterizes observations with cv2.polylines (reference:
tinycarlo/renderer.py:41-43,48-50). Its thickness >= 2 stroke was
reverse-engineered empirically against cv2 5.0 (no source access) to
bit-exactness -- 0 mismatches over ~40k fuzz cases across image sizes,
thicknesses 2..8, and int32-range coordinates (tests/test_cv2_stroke.py
re-runs a slice of that fuzz against the live cv2). The model:

1. **Integer pre-clip**: the segment (integer endpoints, as the
   reference passes np.int32 coords) is clipped with cv2's clipLine
   (Cohen-Sutherland, C-truncating division) to the image rect inflated
   by `thickness` px per side. Rejected segments draw nothing.
2. **Quad**: corners P +- dp in 16.16 fixed point, where
   dp = cvRound(dy * r), cvRound(dx * r) with
   r = (t << 15 + odd(t) * 32768) / sqrt(dx^2 + dy^2) in f64 and
   cvRound = round-half-even; dx = x0 - x1, dy = y1 - y0 (cv2's mixed
   orientation). Degenerate (r ~ 0) segments draw caps only.
3. **Scanline fill** (FillConvexPoly, shift = 16): vertex rows
   r_i = (Y_i + 32768) >> 16; the top vertex (first strict minimum of
   the TRUE fixed-point ys) splits the ring into two 2-edge chains;
   each chain interpolates x rows with slope
   dx_e = tdiv(2 * (xe - xs) + (ty - y0), 2 * (ty - y0)); row y paints
   [(min_chain_x + 32768) >> 16, (max_chain_x + 32768) >> 16] clamped,
   for rows [ymin_row, min(ymax_row - 1, h - 1)] -- the bottom vertex
   row is never filled (the edge budget exhausts first; covered by the
   outline).
4. **Outline** (Line2 per ring edge): clip the fixed-point edge to the
   SCALED rect [0, (w << 16) - 1] x [0, (h << 16) - 1]; paint a 1-px
   dot at BOTH rounded post-clip endpoints; then a major-axis DDA of
   n = ceil((maj2 - maj1) / 65536) pixels from m0 = (maj1 + half) >> 16
   with minor value (mino1 + half + k * tdiv(dmin << 16, amaj | 1))
   >> 16 (major normalized increasing).
5. **Caps**: filled integer circles (cv2's err/plus/minus stepper) of
   radius (t << 15 + 32768) >> 16 = (t + 1) // 2 at both clipped
   endpoints.

Two implementations here:

* `thick_stroke_mask_ref` -- scalar host oracle (pure python ints),
  the direct transcription of the validated model; used by tests.
* `thick_params` / `thick_hit` -- vectorized jnp pair: per-segment
  scalar bundle + per-(pixel, segment) predicate, consumed by the
  dense/tiled rasterizers (`rasterize._segment_hit`) under
  `stroke="exact"`. Under float64 (the parity/test dtype) every
  intermediate is exact and the output is bit-equal to cv2. Under
  float32 the fixed-point values exceed the 2^24 integer-exact range,
  so params are computed in int32 with the two divisions emulated
  exactly; only the scaled outline clip and dp rounding for
  far-off-frame endpoints can drift by one fixed-point ulp (the same
  contract as the thickness-1 path, rasterize._clip_line_cv2).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

XY_SHIFT = 16
XY_ONE = 1 << XY_SHIFT
HALF = XY_ONE >> 1


# ---------------------------------------------------------------------------
# Host oracle (scalar, python ints / f64)
# ---------------------------------------------------------------------------


def _tdiv_host(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _clip_host(right, bottom, x1, y1, x2, y2):
    """cv2 clipLine on [0, right] x [0, bottom] (int64 semantics)."""

    def code(x, y):
        return (x < 0) + (x > right) * 2 + (y < 0) * 4 + (y > bottom) * 8

    c1 = code(x1, y1)
    c2 = code(x2, y2)
    if (c1 & c2) == 0 and (c1 | c2) != 0:
        if c1 & 12:
            a = 0 if c1 < 8 else bottom
            x1 += _tdiv_host((a - y1) * (x2 - x1), (y2 - y1))
            y1 = a
            c1 = (x1 < 0) + (x1 > right) * 2
        if c2 & 12:
            a = 0 if c2 < 8 else bottom
            x2 += _tdiv_host((a - y2) * (x2 - x1), (y2 - y1))
            y2 = a
            c2 = (x2 < 0) + (x2 > right) * 2
        if (c1 & c2) == 0 and (c1 | c2) != 0:
            if c1:
                a = 0 if c1 == 1 else right
                y1 += _tdiv_host((a - x1) * (y2 - y1), (x2 - x1))
                x1 = a
                c1 = 0
            if c2:
                a = 0 if c2 == 1 else right
                y2 += _tdiv_host((a - x2) * (y2 - y1), (x2 - x1))
                x2 = a
                c2 = 0
    return x1, y1, x2, y2, (c1 | c2) == 0


def _line2_host(mask, p1, p2):
    h, w = mask.shape
    x1, y1, x2, y2, ok = _clip_host(
        (w << XY_SHIFT) - 1, (h << XY_SHIFT) - 1, p1[0], p1[1], p2[0], p2[1]
    )
    if not ok:
        return
    for ex, ey in ((x1, y1), (x2, y2)):
        dx_, dy_ = (ex + HALF) >> XY_SHIFT, (ey + HALF) >> XY_SHIFT
        if 0 <= dx_ < w and 0 <= dy_ < h:
            mask[dy_, dx_] = True
    dx = x2 - x1
    dy = y2 - y1
    ax, ay = abs(dx), abs(dy)
    if ax > ay:
        if dx < 0:
            x1, y1, x2, y2 = x2, y2, x1, y1
            dy = -dy
        st = _tdiv_host(dy * XY_ONE, (ax | 1))
        m = (x1 + HALF) >> XY_SHIFT
        n = (x2 - x1 + XY_ONE - 1) >> XY_SHIFT
        v = y1 + HALF
        for _ in range(max(n, 0)):
            yy = v >> XY_SHIFT
            if 0 <= m < w and 0 <= yy < h:
                mask[yy, m] = True
            m += 1
            v += st
    else:
        if dy < 0:
            x1, y1, x2, y2 = x2, y2, x1, y1
            dx = -dx
        st = _tdiv_host(dx * XY_ONE, (ay | 1))
        m = (y1 + HALF) >> XY_SHIFT
        n = (y2 - y1 + XY_ONE - 1) >> XY_SHIFT
        v = x1 + HALF
        for _ in range(max(n, 0)):
            xx = v >> XY_SHIFT
            if 0 <= xx < w and 0 <= m < h:
                mask[m, xx] = True
            m += 1
            v += st


def _fill_host(mask, v):
    """FillConvexPoly scanfill + Line2 outlines, shift = XY_SHIFT."""
    h, w = mask.shape
    npts = len(v)
    p0 = v[-1]
    for p in v:
        _line2_host(mask, p0, p)
        p0 = p

    ys = [p[1] for p in v]
    imin = 0
    ymin_f = ys[0]
    for i, yy in enumerate(ys):
        if yy < ymin_f:
            ymin_f = yy
            imin = i
    ymin = (ymin_f + HALF) >> XY_SHIFT
    ymax = (max(ys) + HALF) >> XY_SHIFT
    xmin = (min(p[0] for p in v) + HALF) >> XY_SHIFT
    xmax = (max(p[0] for p in v) + HALF) >> XY_SHIFT
    if npts < 3 or xmax < 0 or ymax < 0 or xmin >= w or ymin >= h:
        return
    ymax_c = min(ymax, h - 1)
    edge = [
        dict(idx=imin, di=1, x=-XY_ONE, dx=0, ye=ymin),
        dict(idx=imin, di=npts - 1, x=-XY_ONE, dx=0, ye=ymin),
    ]
    edges = npts
    y = ymin
    while True:
        for i in range(2):
            if y >= edge[i]["ye"]:
                idx0 = edge[i]["idx"]
                di = edge[i]["di"]
                idx = idx0 + di
                if idx >= npts:
                    idx -= npts
                while edges > 0:
                    edges -= 1
                    ty = (v[idx][1] + HALF) >> XY_SHIFT
                    if ty > y:
                        xs, xe = v[idx0][0], v[idx][0]
                        edge[i]["ye"] = ty
                        edge[i]["dx"] = _tdiv_host(
                            (xe - xs) * 2 + (ty - y), 2 * (ty - y)
                        )
                        edge[i]["x"] = xs
                        edge[i]["idx"] = idx
                        break
                    idx0 = idx
                    idx += di
                    if idx >= npts:
                        idx -= npts
                else:
                    edges -= 1  # C's for(; edges-- > 0;) exit decrement
        if edges < 0:
            break
        if y >= 0:
            xa, xb = edge[0]["x"], edge[1]["x"]
            if xa > xb:
                xa, xb = xb, xa
            xx1 = (xa + HALF) >> XY_SHIFT
            xx2 = (xb + HALF) >> XY_SHIFT
            if xx2 >= 0 and xx1 < w:
                mask[y, max(xx1, 0): min(xx2, w - 1) + 1] = True
        edge[0]["x"] += edge[0]["dx"]
        edge[1]["x"] += edge[1]["dx"]
        y += 1
        if y > ymax_c:
            break


def cap_table(radius: int) -> Tuple[int, ...]:
    """Half-width per |row offset| of cv2's filled integer circle."""
    W = {}
    err, dx, dy = 0, radius, 0
    plus, minus = 1, (radius << 1) - 1
    while dx >= dy:
        W[dy] = max(W.get(dy, -1), dx)
        W[dx] = max(W.get(dx, -1), dy)
        dy += 1
        err += plus
        plus += 2
        m = 0 if err <= 0 else -1
        err -= minus & m
        dx += m
        minus -= m & 2
    return tuple(W[m] for m in sorted(W))


def cap_radius(thickness: int) -> int:
    return ((thickness << (XY_SHIFT - 1)) + HALF) >> XY_SHIFT


def _circle_host(mask, cx, cy, radius):
    h, w = mask.shape
    tab = cap_table(radius)
    for m, hw in enumerate(tab):
        for yy in (cy - m, cy + m):
            if 0 <= yy < h:
                xa, xb = max(cx - hw, 0), min(cx + hw, w - 1)
                if xb >= xa:
                    mask[yy, xa: xb + 1] = True


def thick_stroke_mask_ref(
    p0, p1, thickness: int, resolution: Tuple[int, int]
) -> np.ndarray:
    """(H, W) bool mask of cv2.polylines([p0, p1], thickness, LINE_8)
    for thickness >= 2 -- the validated scalar oracle."""
    h, w = resolution
    mask = np.zeros((h, w), bool)
    pad = thickness
    x1, y1, x2, y2, ok = _clip_host(
        w - 1 + 2 * pad, h - 1 + 2 * pad,
        int(p0[0]) + pad, int(p0[1]) + pad,
        int(p1[0]) + pad, int(p1[1]) + pad,
    )
    if not ok:
        return mask
    P0 = ((x1 - pad) * XY_ONE, (y1 - pad) * XY_ONE)
    P1 = ((x2 - pad) * XY_ONE, (y2 - pad) * XY_ONE)
    dx = (P0[0] - P1[0]) / float(XY_ONE)
    dy = (P1[1] - P0[1]) / float(XY_ONE)
    r = dx * dx + dy * dy
    odd = thickness & 1
    th = thickness << (XY_SHIFT - 1)
    if abs(r) > np.finfo(np.float64).eps:
        r = (th + odd * XY_ONE * 0.5) / np.sqrt(r)
        dpx = int(np.rint(dy * r))
        dpy = int(np.rint(dx * r))
        _fill_host(
            mask,
            [
                (P0[0] + dpx, P0[1] + dpy),
                (P0[0] - dpx, P0[1] - dpy),
                (P1[0] - dpx, P1[1] - dpy),
                (P1[0] + dpx, P1[1] + dpy),
            ],
        )
    rad = cap_radius(thickness)
    for p in (P0, P1):
        _circle_host(mask, (p[0] + HALF) >> XY_SHIFT, (p[1] + HALF) >> XY_SHIFT, rad)
    return mask


# ---------------------------------------------------------------------------
# Vectorized jnp params + predicate
# ---------------------------------------------------------------------------


def _tdiv_i32(a, b):
    """C-truncating int32 division (b != 0)."""
    q = a // b  # floor
    return q + ((a % b != 0) & ((a < 0) != (b < 0))).astype(a.dtype)


def _clip_f(right, bottom, x1, y1, x2, y2):
    """Vectorized cv2 clipLine against [0, right] x [0, bottom] in the
    float dtype of the inputs (trunc division; exact under f64 for the
    value ranges reached here). Same algorithm as
    rasterize._clip_line_cv2 but with explicit bounds."""
    dtype = x1.dtype
    right = dtype.type(right)
    bottom = dtype.type(bottom)
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
    x1 = jnp.where(do, x1 + tdiv((a - y1) * (x2 - x1), y2 - y1), x1)
    y1 = jnp.where(do, a, y1)
    c1 = jnp.where(
        do, (x1 < 0).astype(jnp.int32) + 2 * (x1 > right).astype(jnp.int32), c1
    )

    do = active & ((c2 & 12) != 0)
    a = jnp.where(c2 < 8, zero, bottom)
    x2 = jnp.where(do, x2 + tdiv((a - y2) * (x2 - x1), y2 - y1), x2)
    y2 = jnp.where(do, a, y2)
    c2 = jnp.where(
        do, (x2 < 0).astype(jnp.int32) + 2 * (x2 > right).astype(jnp.int32), c2
    )

    active = ((c1 & c2) == 0) & ((c1 | c2) != 0)
    do = active & (c1 != 0)
    a = jnp.where(c1 == 1, zero, right)
    y1 = jnp.where(do, y1 + tdiv((a - x1) * (y2 - y1), x2 - x1), y1)
    x1 = jnp.where(do, a, x1)
    c1 = jnp.where(do, 0, c1)

    do = active & (c2 != 0)
    a = jnp.where(c2 == 1, zero, right)
    y2 = jnp.where(do, y2 + tdiv((a - x2) * (y2 - y1), x2 - x1), y2)
    x2 = jnp.where(do, a, x2)
    c2 = jnp.where(do, 0, c2)

    return x1, y1, x2, y2, (c1 | c2) == 0


def _pick4(vals, idx):
    """vals: list of 4 arrays; idx in 0..3 (array). 4-way select."""
    out = vals[0]
    for i in (1, 2, 3):
        out = jnp.where(idx == i, vals[i], out)
    return out


def _edge_outline_params(x1i, y1i, x2i, y2i, live, h: int, w: int, fdtype):
    """Line2 params for one ring edge given int32 fixed-point endpoints.

    Returns dict of int32 arrays: dot coords (2), axis flag, m0, n, v0,
    st, plus `acc` bool. The scaled clip runs in the float dtype
    (exact under f64)."""
    xf1 = x1i.astype(fdtype)
    yf1 = y1i.astype(fdtype)
    xf2 = x2i.astype(fdtype)
    yf2 = y2i.astype(fdtype)
    xc1, yc1, xc2, yc2, ok = _clip_f(
        (w << XY_SHIFT) - 1, (h << XY_SHIFT) - 1, xf1, yf1, xf2, yf2
    )
    acc = ok & live
    x1 = xc1.astype(jnp.int32)
    y1 = yc1.astype(jnp.int32)
    x2 = xc2.astype(jnp.int32)
    y2 = yc2.astype(jnp.int32)
    d0x = (x1 + HALF) >> XY_SHIFT
    d0y = (y1 + HALF) >> XY_SHIFT
    d1x = (x2 + HALF) >> XY_SHIFT
    d1y = (y2 + HALF) >> XY_SHIFT
    dx = x2 - x1
    dy = y2 - y1
    ax = jnp.abs(dx)
    ay = jnp.abs(dy)
    xmaj = ax > ay
    # normalize major increasing
    swap = jnp.where(xmaj, dx < 0, dy < 0)
    nx1 = jnp.where(swap, x2, x1)
    ny1 = jnp.where(swap, y2, y1)
    nx2 = jnp.where(swap, x1, x2)
    ny2 = jnp.where(swap, y1, y2)
    maj1 = jnp.where(xmaj, nx1, ny1)
    maj2 = jnp.where(xmaj, nx2, ny2)
    mino1 = jnp.where(xmaj, ny1, nx1)
    mino2 = jnp.where(xmaj, ny2, nx2)
    amaj = jnp.maximum(ax, ay) | 1
    dmin = mino2 - mino1
    # st = tdiv(dmin << 16, amaj): dmin << 16 overflows int32. Split
    # exactly through 2^4 factors: with dmin = q*amaj + r (trunc pair,
    # |r| < amaj, sign(r) = sign(dmin)), trunc((dmin * c) / amaj) =
    # q * c + trunc((r * c) / amaj) whenever q * c * amaj is an exact
    # multiple -- apply with c = 16 four times; every intermediate
    # |r * 16| < 16 * amaj <= ~1.5e9 stays in int32.
    st = _tdiv_i32(dmin, amaj)
    r = dmin - st * amaj
    for _ in range(4):
        q = _tdiv_i32(r * 16, amaj)
        r = r * 16 - q * amaj
        st = (st << 4) + q
    m0 = (maj1 + HALF) >> XY_SHIFT
    n = (maj2 - maj1 + XY_ONE - 1) >> XY_SHIFT
    v0 = mino1 + HALF
    # The NORMALIZED-far dot: the DDA's k=0 pixel realizes the rounded
    # normalized-NEAR endpoint (same (·+HALF)>>16 formula), so a single
    # extra dot at the normalized-far endpoint covers both of cv2's
    # post-clip endpoint dots. For direction-swapped edges that far dot
    # is (d0x, d0y), NOT (d1x, d1y) -- shipping d1 unconditionally
    # drops the d0 dot on clipped swapped edges (advisor round-4 high).
    fdx = jnp.where(swap, d0x, d1x)
    fdy = jnp.where(swap, d0y, d1y)
    return dict(
        acc=acc, d0x=d0x, d0y=d0y, d1x=d1x, d1y=d1y, fdx=fdx, fdy=fdy,
        xmaj=xmaj, m0=m0, n=n, v0=v0, st=st,
    )


def thick_params(ax, ay, bx, by, thickness: int, resolution: Tuple[int, int]):
    """Per-segment exact-stroke scalar bundle.

    ax..by: integer-valued float arrays (any shape) -- the segment
    endpoints in pixels, already int-truncated (rasterize._int_endpoints
    semantics). Returns a dict of arrays with the same leading shape.
    """
    h, w = resolution
    fdtype = ax.dtype
    t = int(thickness)
    pad = t

    # 1. integer pre-clip on the inflated rect (shift coords by +pad)
    x1, y1, x2, y2, ok = _clip_f(
        w - 1 + 2 * pad, h - 1 + 2 * pad, ax + pad, ay + pad, bx + pad, by + pad
    )
    p0x = (x1 - pad).astype(jnp.int32)
    p0y = (y1 - pad).astype(jnp.int32)
    p1x = (x2 - pad).astype(jnp.int32)
    p1y = (y2 - pad).astype(jnp.int32)
    accept = ok

    # 2. quad corners: dp from f64-ordered float math (cv2 uses double;
    # under f32 the sqrt/round can differ by one ulp for rare boundary
    # cases -- documented drift, matching the t=1 contract)
    dxf = (p0x - p1x).astype(fdtype)
    dyf = (p1y - p0y).astype(fdtype)
    r2 = dxf * dxf + dyf * dyf
    has_quad = jnp.abs(r2) > np.finfo(np.float64).eps
    th = t << (XY_SHIFT - 1)
    odd = t & 1
    rr = (fdtype.type(th) + fdtype.type(odd * XY_ONE * 0.5)) / jnp.sqrt(
        jnp.where(has_quad, r2, fdtype.type(1))
    )
    dpx = jnp.rint(dyf * rr).astype(jnp.int32)
    dpy = jnp.rint(dxf * rr).astype(jnp.int32)
    X = [
        (p0x << XY_SHIFT) + dpx,
        (p0x << XY_SHIFT) - dpx,
        (p1x << XY_SHIFT) - dpx,
        (p1x << XY_SHIFT) + dpx,
    ]
    Y = [
        (p0y << XY_SHIFT) + dpy,
        (p0y << XY_SHIFT) - dpy,
        (p1y << XY_SHIFT) - dpy,
        (p1y << XY_SHIFT) + dpy,
    ]

    # 3. fill chains. imin = first strict min of true fixed-point ys.
    ys = jnp.stack(Y, axis=-1)
    imin = jnp.argmin(ys, axis=-1).astype(jnp.int32)
    rows = [(yy + HALF) >> XY_SHIFT for yy in Y]

    def chain(di):
        i0 = imin
        i1 = (imin + di) % 4
        i2 = (imin + 2) % 4
        q0 = _pick4(rows, i0)
        q1 = _pick4(rows, i1)
        q2 = _pick4(rows, i2)
        xs1 = _pick4(X, i0)
        xm = _pick4(X, i1)
        xs2 = xm
        d1 = jnp.maximum(q1 - q0, 1)
        d2 = jnp.maximum(q2 - q1, 1)
        dx1 = jnp.where(
            q1 > q0, _tdiv_i32((xm - xs1) * 2 + (q1 - q0), 2 * d1), 0
        )
        xe2 = _pick4(X, i2)
        dx2 = jnp.where(
            q2 > q1, _tdiv_i32((xe2 - xs2) * 2 + (q2 - q1), 2 * d2), 0
        )
        return q1, xs1, dx1, xs2, dx2

    brk_a, xs1_a, dx1_a, xs2_a, dx2_a = chain(1)
    brk_b, xs1_b, dx1_b, xs2_b, dx2_b = chain(3)
    ymin_row = _pick4(rows, imin)
    ymax_row = _pick4(rows, (imin + 2) % 4)
    stop_row = jnp.minimum(ymax_row - 1, h - 1)
    # FillConvexPoly's pre-fill reject (all-rounded extents off-frame)
    xr = [(xx + HALF) >> XY_SHIFT for xx in X]
    xmin_r = jnp.minimum(jnp.minimum(xr[0], xr[1]), jnp.minimum(xr[2], xr[3]))
    xmax_r = jnp.maximum(jnp.maximum(xr[0], xr[1]), jnp.maximum(xr[2], xr[3]))
    fill_ok = (
        accept & has_quad
        & (ymax_row >= 0) & (ymin_row < h) & (xmax_r >= 0) & (xmin_r < w)
    )

    # 4. outline params per ring edge (3->0, 0->1, 1->2, 2->3)
    live = accept & has_quad
    edges = []
    for (i, j) in ((3, 0), (0, 1), (1, 2), (2, 3)):
        edges.append(
            _edge_outline_params(X[i], Y[i], X[j], Y[j], live, h, w, fdtype)
        )

    return dict(
        accept=accept,
        fill_ok=fill_ok,
        ymin_row=ymin_row,
        stop_row=stop_row,
        brk_a=brk_a, xs1_a=xs1_a, dx1_a=dx1_a, xs2_a=xs2_a, dx2_a=dx2_a,
        brk_b=brk_b, xs1_b=xs1_b, dx1_b=dx1_b, xs2_b=xs2_b, dx2_b=dx2_b,
        edges=edges,
        cap0x=p0x, cap0y=p0y, cap1x=p1x, cap1y=p1y,
    )


def thick_hit(px, py, params, thickness: int):
    """Per-(pixel, segment) exact-stroke predicate.

    px, py: integer-valued arrays broadcastable against the param
    arrays (the dense path passes (H, W, 1) pixels against (E,)
    params). Returns bool."""
    p = params
    pxi = px.astype(jnp.int32)
    pyi = py.astype(jnp.int32)

    # fill span
    ya = pyi - p["ymin_row"]
    x_a = jnp.where(
        pyi < p["brk_a"],
        p["xs1_a"] + p["dx1_a"] * ya,
        p["xs2_a"] + p["dx2_a"] * (pyi - p["brk_a"]),
    )
    x_b = jnp.where(
        pyi < p["brk_b"],
        p["xs1_b"] + p["dx1_b"] * ya,
        p["xs2_b"] + p["dx2_b"] * (pyi - p["brk_b"]),
    )
    lo = (jnp.minimum(x_a, x_b) + HALF) >> XY_SHIFT
    hi = (jnp.maximum(x_a, x_b) + HALF) >> XY_SHIFT
    hit = (
        p["fill_ok"]
        & (pyi >= p["ymin_row"]) & (pyi <= p["stop_row"])
        & (pxi >= lo) & (pxi <= hi)
    )

    # outline edges + dots
    for e in p["edges"]:
        k = jnp.where(e["xmaj"], pxi, pyi) - e["m0"]
        mino = jnp.where(e["xmaj"], pyi, pxi)
        val = (e["v0"] + k * e["st"]) >> XY_SHIFT
        hit = hit | (
            e["acc"] & (k >= 0) & (k < e["n"]) & (mino == val)
        )
        hit = hit | (e["acc"] & (pxi == e["d0x"]) & (pyi == e["d0y"]))
        hit = hit | (e["acc"] & (pxi == e["d1x"]) & (pyi == e["d1y"]))

    # caps
    rad = cap_radius(thickness)
    tab = cap_table(rad)
    for cx, cy in ((p["cap0x"], p["cap0y"]), (p["cap1x"], p["cap1y"])):
        m = jnp.abs(pyi - cy)
        hw = jnp.full_like(m, -1)
        for off, half_w in enumerate(tab):
            hw = jnp.where(m == off, half_w, hw)
        hit = hit | (p["accept"] & (jnp.abs(pxi - cx) <= hw))
    return hit


def stroke_y_extent(thickness: int) -> float:
    """Band-culling superset radius for the exact stroke: quad halfwidth
    <= (t + 1) / 2 + rounding (1 px) and cap radius (t + 1) // 2; the
    integer pre-clip only moves endpoints along the segment by < 1 px.
    """
    return thickness / 2.0 + 2.0
