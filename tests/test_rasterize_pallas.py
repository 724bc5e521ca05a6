"""Pallas rasterizer vs the dense jnp reference: bit-equality on random
segment sets and on real projected camera frames (interpret mode on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinycarlo_tpu.ops import rasterize as ras
from tinycarlo_tpu.ops.rasterize_pallas import (
    compact_soa,
    rasterize_masks_pallas,
)


def _random_case(seed, L=3, E=24, H=32, W=48, frac=0.5):
    rng = np.random.default_rng(seed)
    p0 = jnp.asarray(rng.uniform(-10, W + 10, (L, E, 2)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-10, H + 10, (L, E, 2)), jnp.float32)
    draw = jnp.asarray(rng.random((L, E)) < frac)
    return p0, p1, draw


def _eligible(p0, p1, draw, h, thickness):
    """Slot eligibility oracle: drawn AND the stroke intersects the image
    rows (nb > 0 in compact_soa / compact_env_soa)."""
    a, b = ras._int_endpoints(p0, p1, jnp.float32)
    a, b = np.asarray(a), np.asarray(b)
    rf = float(ras._stroke_radius_sq(thickness)) ** 0.5
    ylo = np.minimum(a[..., 1], b[..., 1]) - rf
    yhi = np.maximum(a[..., 1], b[..., 1]) + rf
    return np.asarray(draw) & (yhi >= 0.0) & (ylo <= h - 1.0)


def test_compact_preserves_all_drawn():
    """Live slot prefix holds every eligible segment (drawn AND its
    stroke intersects the frame rows -- fully y-clipped segments never
    take a slot): shorts first then talls, original order within each
    class (rasterization is an OR, so the reordering is output-neutral).
    """
    p0, p1, draw = _random_case(0)
    k = 16
    ax, ay, abx, aby, inv, bw, counts = compact_soa(
        p0[None], p1[None], draw[None], k, 16, 32, 2
    )
    L = draw.shape[0]
    elig = _eligible(p0, p1, draw, 32, 2)
    n_all = np.asarray(counts)[0].reshape(1, L)[0]
    np.testing.assert_array_equal(n_all, np.minimum(elig.sum(axis=-1), k))
    np.testing.assert_array_equal(np.asarray(counts)[2], 0)
    a, b = ras._int_endpoints(p0, p1, jnp.float32)
    a, b = np.asarray(a), np.asarray(b)
    for l in range(L):
        m = elig[l]
        got = set(
            zip(
                np.asarray(ax)[0, l, : n_all[l]].tolist(),
                np.asarray(ay)[0, l, : n_all[l]].tolist(),
            )
        )
        want = set(zip(a[l][m][:, 0].tolist(), a[l][m][:, 1].tolist()))
        assert got == want


def test_compact_no_limit_keeps_all_slots():
    """k >= E: sort-based ordering; eligible segments fill the live
    prefix and dead slots are disabled via a zero band count."""
    p0, p1, draw = _random_case(1)
    E = p0.shape[1]
    ax, ay, abx, aby, inv, bw, counts = compact_soa(
        p0[None], p1[None], draw[None], E, 16, 32, 2
    )
    L = draw.shape[0]
    elig = _eligible(p0, p1, draw, 32, 2)
    n_all = np.asarray(counts)[0].reshape(1, L)[0]
    np.testing.assert_array_equal(n_all, elig.sum(axis=-1))
    from tinycarlo_tpu.ops import rasterize_pallas as rp

    nb = np.asarray(bw) % rp._NB_PACK
    for l in range(L):
        assert np.all(nb[0, l, n_all[l] :] == 0)


def _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, thickness):
    """Pixels exactly on a stroke boundary (lateral or cap radius, or the
    body/cap seam where the projection parameter sits on 0/1) may differ
    between compilations (FMA/fusion/reciprocal rounding); everything
    else must match bit-for-bit. Thickness 1 (exact Bresenham in both
    implementations) must match everywhere."""
    got, expected = np.asarray(got), np.asarray(expected)
    diff = np.argwhere(got != expected)
    if len(diff) == 0:
        return
    assert thickness > 1, f"t=1 must be exact; differs at {diff[:5]}"
    a, b = ras._int_endpoints(p0, p1, jnp.float32)
    lat, cap = ras._split_radii(thickness)
    lat2, cap2 = lat * lat, cap * cap
    ax, ay = np.asarray(a[..., 0]), np.asarray(a[..., 1])
    bx, by = np.asarray(b[..., 0]), np.asarray(b[..., 1])
    for l, y, x in diff:
        d2 = np.asarray(
            ras._segment_dist_sq(
                jnp.float32(x), jnp.float32(y),
                a[l, :, 0], a[l, :, 1], b[l, :, 0], b[l, :, 1],
            )
        )
        abx, aby = bx[l] - ax[l], by[l] - ay[l]
        denom = np.maximum(abx * abx + aby * aby, 1.0)
        tu = ((x - ax[l]) * abx + (y - ay[l]) * aby) / denom
        drawn = np.asarray(draw[l])
        on_radius = (np.abs(d2 - lat2) < 1e-3) | (np.abs(d2 - cap2) < 1e-3)
        # body/cap seam: the projection parameter sits on 0/1 to within
        # reciprocal rounding while the pixel lies between the two radii
        seam = (
            (np.minimum(np.abs(tu), np.abs(tu - 1.0)) < 1e-5)
            & (d2 >= cap2 - 1e-3)
            & (d2 <= lat2 + 1e-3)
        )
        assert np.any((on_radius | seam) & drawn), (
            f"non-boundary pixel differs at {(l, y, x)}"
        )
    assert len(diff) < got.size * 0.005, "too many boundary diffs"


@pytest.mark.parametrize("thickness", [1, 2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_equal_random(seed, thickness):
    p0, p1, draw = _random_case(seed)
    expected = ras.rasterize_masks(p0, p1, draw, (32, 48), thickness)
    got = rasterize_masks_pallas(
        p0, p1, draw, (32, 48), thickness, interpret=True
    )
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, thickness)


def test_bit_equal_no_drawn_segments():
    p0, p1, draw = _random_case(3, frac=0.0)
    got = rasterize_masks_pallas(p0, p1, draw, (32, 48), 2, interpret=True)
    assert np.asarray(got).sum() == 0


def test_bit_equal_real_frame():
    """Project a real camera frame and compare rasterizers."""
    from tests.test_env import CONFIG
    from tinycarlo_tpu import camera as cam
    from tinycarlo_tpu import env as fenv

    cfg = dict(CONFIG)
    cfg["camera"] = dict(CONFIG["camera"], resolution=[64, 80])
    params = fenv.make_env_params(cfg, dtype=jnp.float32)
    state, _, _ = fenv.reset(params, jax.random.key(0), render=False)
    body = cam.car_world_to_body_matrix(state.car.position, state.car.rotation)
    pose = params.camera.E @ body
    md = params.map_data
    p0, p1, draw = jax.vmap(
        lambda n, e, m: cam.project_layer(
            n, e, m, pose, params.camera.K, (64, 80), cfg["camera"]["max_range"]
        )
    )(md.laneline_nodes, md.laneline_edges, md.laneline_edge_mask)
    expected = ras.rasterize_masks(p0, p1, draw, (64, 80), 2)
    got = rasterize_masks_pallas(p0, p1, draw, (64, 80), 2, interpret=True)
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, 2)
    assert np.asarray(got).sum() > 0


def test_tall_heavy_frame():
    """Mostly near-vertical segments: exercises the tall-suffix loop and
    the short-pair loop's over-run into the tall tier on odd counts."""
    rng = np.random.default_rng(7)
    L, E, H, W = 2, 20, 64, 48
    x = rng.uniform(0, W, (L, E, 1))
    y0 = rng.uniform(-5, H, (L, E, 1))
    dy = rng.uniform(20, 60, (L, E, 1))
    p0 = jnp.asarray(np.concatenate([x, y0], -1), jnp.float32)
    p1 = jnp.asarray(np.concatenate([x + rng.uniform(-2, 2, (L, E, 1)), y0 + dy], -1), jnp.float32)
    # odd drawn counts per layer to hit the pair-loop over-run
    draw = jnp.asarray(np.arange(E)[None, :] < np.asarray([[7], [13]]))
    expected = ras.rasterize_masks(p0, p1, draw, (H, W), 2)
    got = rasterize_masks_pallas(p0, p1, draw, (H, W), 2, interpret=True)
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, 2)
    assert np.asarray(got).sum() > 0


def test_height_not_multiple_of_granularity():
    """h % 8 != 0: the padded-scratch rows past h must not corrupt output
    and bottom-of-frame windows must still cover the last rows."""
    p0, p1, draw = _random_case(9, H=30, W=40)
    expected = ras.rasterize_masks(p0, p1, draw, (30, 40), 2)
    got = rasterize_masks_pallas(p0, p1, draw, (30, 40), 2, interpret=True)
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, 2)


def test_max_visible_oversubscribed_short_first():
    """More drawn segments than slots: shorts are kept first; output must
    equal the jnp reference restricted to the kept segments."""
    rng = np.random.default_rng(11)
    L, E, H, W, k = 1, 16, 32, 48, 4
    p0 = jnp.asarray(rng.uniform(0, W, (L, E, 2)), jnp.float32)
    p1 = jnp.asarray(p0 + rng.uniform(-6, 6, (L, E, 2)), jnp.float32)
    draw = jnp.ones((L, E), bool)
    got = rasterize_masks_pallas(p0, p1, draw, (H, W), 1, max_visible=k, interpret=True)
    from tinycarlo_tpu.ops.rasterize_pallas import _NB_PACK, _window_rows, compact_soa

    soa = compact_soa(p0[None], p1[None], draw[None], k, 8, H, 1, w=W)
    ax, ay = np.asarray(soa[0])[0, 0], np.asarray(soa[1])[0, 0]
    # reconstruct which originals were kept: t=1 SoA endpoints are the
    # CLIPPED, anchor-normalized ints (rasterize_pallas._clip_normalize_t1)
    from tinycarlo_tpu.ops.rasterize_pallas import _clip_normalize_t1

    a, b = ras._int_endpoints(p0, p1, jnp.float32)
    cax, cay, _, _, _ = _clip_normalize_t1(
        W, H, a[..., 0], a[..., 1], b[..., 0], b[..., 1], draw
    )
    cax, cay = np.asarray(cax), np.asarray(cay)
    kept = np.zeros(E, bool)
    for s in range(k):
        for e in range(E):
            if not kept[e] and cax[0, e] == ax[s] and cay[0, e] == ay[s]:
                kept[e] = True
                break
    assert kept.sum() == k
    expected = ras.rasterize_masks(p0, p1, jnp.asarray(kept[None, :]), (H, W), 1)
    _assert_equal_up_to_stroke_boundary(
        got, expected, p0, p1, jnp.asarray(kept[None, :]), 1
    )


def test_batched_leading_dims():
    p0, p1, draw = _random_case(4)
    p0b = jnp.stack([p0, p0 + 1])
    p1b = jnp.stack([p1, p1 + 1])
    drawb = jnp.stack([draw, draw])
    got = rasterize_masks_pallas(p0b, p1b, drawb, (32, 48), 1, interpret=True)
    assert got.shape == (2, 3, 32, 48)
    exp0 = ras.rasterize_masks(p0, p1, draw, (32, 48), 1)
    _assert_equal_up_to_stroke_boundary(got[0], exp0, p0, p1, draw, 1)


def _pack(p0, p1, draw):
    """Flatten (L, E) per-layer arrays into the packed edge-axis form."""
    L, E = draw.shape
    lay = jnp.repeat(jnp.arange(L, dtype=jnp.int32), E)
    return (
        p0.reshape(L * E, 2),
        p1.reshape(L * E, 2),
        draw.reshape(L * E),
        lay,
        L,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_packed_matches_per_layer(seed):
    """The packed-edge-axis kernel equals the per-layer kernel and the
    dense reference (env-merged stacked-scratch path)."""
    from tinycarlo_tpu.ops.rasterize_pallas import rasterize_masks_packed_pallas

    p0, p1, draw = _random_case(seed)
    fp0, fp1, fdraw, lay, L = _pack(p0, p1, draw)
    got = rasterize_masks_packed_pallas(
        fp0, fp1, fdraw, lay, L, (32, 48), 2, interpret=True
    )
    expected = ras.rasterize_masks(p0, p1, draw, (32, 48), 2)
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, 2)


def test_packed_batched_and_empty_env():
    """Batched packed input; one env fully empty exercises the uint8
    zero fast path for every layer of the instance."""
    from tinycarlo_tpu.ops.rasterize_pallas import rasterize_masks_packed_pallas

    p0, p1, draw = _random_case(7)
    fp0, fp1, fdraw, lay, L = _pack(p0, p1, draw)
    b0 = (fp0, fp1, fdraw)
    b1 = (fp0 + 2.0, fp1 + 2.0, fdraw)
    b2 = (fp0, fp1, jnp.zeros_like(fdraw))
    P0, P1, D = (jnp.stack(x) for x in zip(b0, b1, b2))
    got = rasterize_masks_packed_pallas(
        P0, P1, D, lay, L, (32, 48), 1, interpret=True
    )
    assert got.shape == (3, L, 32, 48)
    exp0 = ras.rasterize_masks(p0, p1, draw, (32, 48), 1)
    exp1 = ras.rasterize_masks(p0 + 2.0, p1 + 2.0, draw, (32, 48), 1)
    _assert_equal_up_to_stroke_boundary(got[0], exp0, p0, p1, draw, 1)
    _assert_equal_up_to_stroke_boundary(got[1], exp1, p0 + 2.0, p1 + 2.0, draw, 1)
    np.testing.assert_array_equal(np.asarray(got[2]), 0)


def test_packed_auto_cpu_dispatch():
    """The non-TPU fallback of rasterize_masks_packed_auto expands the
    packed axis to per-layer masks and must be bit-equal to the dense
    reference."""
    p0, p1, draw = _random_case(9)
    fp0, fp1, fdraw, lay, L = _pack(p0, p1, draw)
    got = ras.rasterize_masks_packed_auto(
        fp0[None], fp1[None], fdraw[None], lay, L, (32, 48), 2
    )
    expected = ras.rasterize_masks(p0, p1, draw, (32, 48), 2)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(expected))


def test_packed_oversubscription_keeps_shorts():
    """Per-env slot budget: with more drawn segments than k, talls drop
    first and the kept set renders identically to the reference on it."""
    from tinycarlo_tpu.ops.rasterize_pallas import compact_env_soa

    rng = np.random.default_rng(13)
    E, H, W, k = 16, 32, 48, 6
    p0 = jnp.asarray(rng.uniform(0, W, (1, 1, E, 2)), jnp.float32)
    p1 = jnp.asarray(p0 + rng.uniform(-4, 4, (1, 1, E, 2)), jnp.float32)
    draw = jnp.ones((1, 1, E), bool)
    lay = jnp.zeros((E,), jnp.int32)
    soa = compact_env_soa(
        p0, p1, draw, k, 8, H, 1, edge_layer=lay, n_layers=1, w=W
    )
    counts = np.asarray(soa[-1])
    assert counts[0, 0] == k  # live slots filled to the budget
    assert counts[1, 0] <= k  # short count within budget


@pytest.mark.parametrize("W", [160, 300, 130])
def test_wide_frame_lane_split(W):
    """W > 128 engages the lane-split layout (one slot copy per touched
    128-lane block): random segments freely crossing block boundaries,
    including non-multiple-of-128 widths, must match the dense
    reference."""
    rng = np.random.default_rng(21 + W)
    L, E, H = 2, 18, 40
    p0 = jnp.asarray(rng.uniform(-20, W + 20, (L, E, 2)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-20, W + 20, (L, E, 2)), jnp.float32)
    p0 = p0.at[..., 1].set(jnp.asarray(rng.uniform(-5, H + 5, (L, E)), jnp.float32))
    p1 = p1.at[..., 1].set(jnp.asarray(rng.uniform(-5, H + 5, (L, E)), jnp.float32))
    draw = jnp.asarray(rng.random((L, E)) < 0.6)
    expected = ras.rasterize_masks(p0, p1, draw, (H, W), 2)
    got = rasterize_masks_pallas(p0, p1, draw, (H, W), 2, interpret=True)
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, 2)
    assert np.asarray(got).sum() > 0


def test_wide_frame_packed_lane_split():
    """Packed edge axis at W > 128: lane split + layer fold together."""
    from tinycarlo_tpu.ops.rasterize_pallas import rasterize_masks_packed_pallas

    rng = np.random.default_rng(33)
    L, E, H, W = 3, 12, 32, 200
    p0 = jnp.asarray(rng.uniform(-10, W + 10, (L, E, 2)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-10, W + 10, (L, E, 2)), jnp.float32)
    p0 = p0.at[..., 1].set(jnp.asarray(rng.uniform(-5, H + 5, (L, E)), jnp.float32))
    p1 = p1.at[..., 1].set(jnp.asarray(rng.uniform(-5, H + 5, (L, E)), jnp.float32))
    draw = jnp.asarray(rng.random((L, E)) < 0.6)
    fp0, fp1, fdraw, lay, _ = _pack(p0, p1, draw)
    got = rasterize_masks_packed_pallas(
        fp0, fp1, fdraw, lay, L, (H, W), 2, interpret=True
    )
    expected = ras.rasterize_masks(p0, p1, draw, (H, W), 2)
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, 2)
    assert np.asarray(got).sum() > 0


def test_wide_oversubscribed_budget_scales_with_blocks():
    """max_visible under the lane split: the slot budget is max_visible *
    ceil(w/128), so a frame with <= max_visible eligible segments is
    rendered exactly even when its slot-copy count exceeds max_visible;
    and painted pixels are always a subset of the unbudgeted render."""
    rng = np.random.default_rng(41)
    L, E, H, W = 1, 6, 32, 300  # nxb = 3
    # long horizontal segments touching all three lane blocks
    y = rng.uniform(2, H - 2, (L, E, 1))
    p0 = jnp.asarray(np.concatenate([np.full((L, E, 1), 1.0), y], -1), jnp.float32)
    p1 = jnp.asarray(np.concatenate([np.full((L, E, 1), W - 2.0), y + 0.5], -1), jnp.float32)
    draw = jnp.ones((L, E), bool)
    expected = ras.rasterize_masks(p0, p1, draw, (H, W), 1)
    # budget E segments -> 3E slot copies available, 3E needed: exact
    got = rasterize_masks_pallas(p0, p1, draw, (H, W), 1, max_visible=E, interpret=True)
    _assert_equal_up_to_stroke_boundary(got, expected, p0, p1, draw, 1)
    # budget E-2 -> copies dropped, but never spurious pixels
    got2 = np.asarray(
        rasterize_masks_pallas(p0, p1, draw, (H, W), 1, max_visible=E - 2, interpret=True)
    )
    exp = np.asarray(expected)
    assert np.all(exp[got2 > 0] > 0)
    assert got2.sum() < exp.sum()


def test_segment_overflow_counts():
    """segment_overflow reports exactly the eligible copies past the
    budget; zero when within budget or unbudgeted."""
    from tinycarlo_tpu.ops.rasterize_pallas import segment_overflow

    rng = np.random.default_rng(55)
    B, E, H, W = 2, 10, 32, 48  # nxb = 1
    p0 = jnp.asarray(
        np.stack(
            [rng.uniform(0, W, (B, E)), rng.uniform(4, H - 8, (B, E))], -1
        ),
        jnp.float32,
    )
    p1 = jnp.asarray(p0 + rng.uniform(-3, 3, (B, E, 2)), jnp.float32)
    # env 1: push half the segments fully below the frame (ineligible)
    p0 = p0.at[1, :5, 1].add(100.0)
    p1 = p1.at[1, :5, 1].add(100.0)
    draw = jnp.ones((B, E), bool)
    ov = np.asarray(segment_overflow(p0, p1, draw, (H, W), 1, 4))
    np.testing.assert_array_equal(ov, [E - 4, E - 5 - 4])
    ov0 = np.asarray(segment_overflow(p0, p1, draw, (H, W), 1, None))
    np.testing.assert_array_equal(ov0, 0)
    ov_ok = np.asarray(segment_overflow(p0, p1, draw, (H, W), 1, E))
    np.testing.assert_array_equal(ov_ok, 0)


def test_env_check_segment_overflow():
    """env.check_segment_overflow: zero at the default budget on
    simple_layout; positive with an absurdly small budget."""
    import dataclasses

    from tests.test_env import CONFIG
    from tinycarlo_tpu import env as fenv

    params = fenv.make_env_params(dict(CONFIG), dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(0), 4)
    states, _, _ = jax.vmap(
        lambda k: fenv.reset(params, k, render=False)
    )(keys)
    assert np.all(np.asarray(fenv.check_segment_overflow(params, states)) == 0)
    tiny = dataclasses.replace(params.cfg.camera, max_visible_segments=1)
    params_tiny = params.replace(cfg=dataclasses.replace(params.cfg, camera=tiny))
    assert np.asarray(fenv.check_segment_overflow(params_tiny, states)).max() > 0


@pytest.mark.parametrize("group,nbuf", [(1, 2), (4, 3)])
def test_env_dma_kernel_matches_reference(group, nbuf):
    """The manual-DMA kernel variant (kept for A/B measurement) matches
    the dense reference, including the grouped/multi-buffer layout and
    an empty env in the batch."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        compact_env_idx,
        rasterize_env_dma,
    )

    rng = np.random.default_rng(17)
    L, E, H, W, B = 3, 20, 32, 160, 8
    p0 = jnp.asarray(
        np.stack([rng.uniform(-10, W + 10, (B, L, E)),
                  rng.uniform(-10, H + 10, (B, L, E))], -1), jnp.float32)
    p1 = jnp.asarray(
        np.stack([rng.uniform(-10, W + 10, (B, L, E)),
                  rng.uniform(-10, H + 10, (B, L, E))], -1), jnp.float32)
    draw = rng.random((B, L, E)) < 0.5
    draw[2] = False
    draw = jnp.asarray(draw)
    lay = jnp.repeat(jnp.arange(L, dtype=jnp.int32), E)
    from tinycarlo_tpu.ops.rasterize_pallas import _n_xblocks

    k = L * E * _n_xblocks(W)
    soa = compact_env_idx(
        p0.reshape(B, 1, L * E, 2), p1.reshape(B, 1, L * E, 2),
        draw.reshape(B, 1, L * E), k, 8, H, 2,
        edge_layer=lay, n_layers=L, w=W,
    )
    got = rasterize_env_dma(
        soa, L, (H, W), 2, gran=8, split=True, group=group, nbuf=nbuf,
        interpret=True,
    )
    assert got.shape == (B, L, H, W)
    for i in range(B):
        exp = ras.rasterize_masks(p0[i], p1[i], draw[i], (H, W), 2)
        _assert_equal_up_to_stroke_boundary(
            got[i], exp, p0[i], p1[i], draw[i], 2
        )
    np.testing.assert_array_equal(np.asarray(got[2]), 0)


def test_segment_axis_alternate_matches_production():
    """compact_env_seg + rasterize_env_seg (the measured-slower
    segment-axis alternate, kept for A/B -- docs/KERNELS.md round-3)
    must stay bit-equal to the production copy-axis path, including
    across the lane split and tall segments."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        compact_env_seg, rasterize_env_seg,
    )

    rng = np.random.default_rng(77)
    B, L, E, H, W = 3, 2, 24, 64, 200  # nxb = 2
    p0 = jnp.asarray(
        np.stack(
            [rng.uniform(-20, W + 20, (B, L, E)),
             rng.uniform(-20, H + 20, (B, L, E))], -1
        ),
        jnp.float32,
    )
    # mix of short, block-crossing, and tall segments
    d = np.stack(
        [rng.uniform(-150, 150, (B, L, E)),
         rng.uniform(-40, 40, (B, L, E))], -1
    )
    p1 = jnp.asarray(np.asarray(p0) + d, jnp.float32)
    draw = jnp.asarray(rng.random((B, L, E)) < 0.8)
    expected = rasterize_masks_pallas(
        p0, p1, draw, (H, W), 2, interpret=True
    )
    soa = compact_env_seg(
        p0[..., 0], p0[..., 1], p1[..., 0], p1[..., 1], draw,
        L * E, 16, H, 2, w=W,
    )
    got = rasterize_env_seg(soa, L, (H, W), 2, gran=16, split=True,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_float_out_dtype_matches_uint8():
    """A float out_dtype emits exactly (uint8_mask > 0) as 0/1 in that
    dtype -- the in-graph encoder feed (train/td3_loop obs_dtype) must be
    value-identical to the uint8 observation contract."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
    )

    rng = np.random.default_rng(11)
    B, E, H, W = 3, 24, 32, 160
    L = 2
    u0 = jnp.asarray(rng.uniform(-5, W + 5, (B, E)), jnp.float32)
    v0 = jnp.asarray(rng.uniform(-5, H + 5, (B, E)), jnp.float32)
    u1 = u0 + jnp.asarray(rng.uniform(-30, 30, (B, E)), jnp.float32)
    v1 = v0 + jnp.asarray(rng.uniform(-10, 10, (B, E)), jnp.float32)
    draw = jnp.asarray(rng.random((B, E)) < 0.6)
    edge_layer = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)

    ref = rasterize_masks_packed_pallas_soa(
        u0, v0, u1, v1, draw, edge_layer, L, (H, W), 2, interpret=True
    )
    for dt in (jnp.float32, jnp.bfloat16):
        got = rasterize_masks_packed_pallas_soa(
            u0, v0, u1, v1, draw, edge_layer, L, (H, W), 2,
            interpret=True, out_dtype=dt,
        )
        assert got.dtype == dt
        np.testing.assert_array_equal(
            np.asarray(got, np.float32),
            (np.asarray(ref) > 0).astype(np.float32),
        )
    assert np.asarray(ref).sum() > 0


def test_render_observation_batch_out_dtype():
    """env-level float masks equal (uint8 obs > 0) on the fallback path."""
    from tests.test_env import CONFIG
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector

    cfg = dict(CONFIG)
    cfg["camera"] = dict(CONFIG["camera"], resolution=[32, 40])
    params = fenv.make_env_params(cfg, dtype=jnp.float32)
    vstate, _ = vector.reset(params, jax.random.key(0), 4, render=False)
    u8 = fenv.render_observation_batch(params, vstate.env)
    f32 = fenv.render_observation_batch(
        params, vstate.env, out_dtype=jnp.float32
    )
    assert f32.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(f32), (np.asarray(u8) > 0).astype(np.float32)
    )


def test_rank_kernel_rgb_equals_mask_composite():
    """The rank kernel + palette composite produces the identical rgb
    frame to the per-layer masks + paint-order composite (the rgb fast
    path, docs/KERNELS.md rank-kernel note), including overlapping
    layers, lane-split widths, and empty envs."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
        rasterize_rank_packed_soa,
    )

    rng = np.random.default_rng(23)
    B, E, H, W, L = 4, 30, 32, 160, 3
    u0 = jnp.asarray(rng.uniform(-5, W + 5, (B, E)), jnp.float32)
    v0 = jnp.asarray(rng.uniform(-5, H + 5, (B, E)), jnp.float32)
    u1 = u0 + jnp.asarray(rng.uniform(-40, 40, (B, E)), jnp.float32)
    v1 = v0 + jnp.asarray(rng.uniform(-12, 12, (B, E)), jnp.float32)
    draw = jnp.asarray(rng.random((B, E)) < 0.7)
    draw = draw.at[3].set(False)  # empty env
    edge_layer = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)
    colors = jnp.asarray(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]], jnp.int32
    )

    for t in (1, 2):
        masks = rasterize_masks_packed_pallas_soa(
            u0, v0, u1, v1, draw, edge_layer, L, (H, W), t, interpret=True
        )
        expected = np.zeros((B, H, W, 3), np.uint8)
        cols = np.asarray(colors, np.uint8)
        m = np.asarray(masks)
        for l in range(L):  # sequential overwrite = cv2 paint order
            expected = np.where(m[:, l, :, :, None] > 0, cols[l], expected)
        rank = rasterize_rank_packed_soa(
            u0, v0, u1, v1, draw, edge_layer, L, (H, W), t, interpret=True
        )
        got = np.asarray(ras.rgb_from_rank(rank, colors))
        np.testing.assert_array_equal(got, expected, err_msg=f"t={t}")
        assert np.asarray(rank).max() <= L
    assert np.asarray(masks).sum() > 0


def test_rank_kernel_odd_height_and_budget():
    """Rank path with h not a multiple of the window granularity and an
    oversubscribed slot budget still matches the masks composite
    restricted to the same kept set (both use the same compaction)."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
        rasterize_rank_packed_soa,
    )

    rng = np.random.default_rng(31)
    B, E, H, W, L = 2, 20, 30, 40, 2
    u0 = jnp.asarray(rng.uniform(0, W, (B, E)), jnp.float32)
    v0 = jnp.asarray(rng.uniform(0, H, (B, E)), jnp.float32)
    u1 = u0 + jnp.asarray(rng.uniform(-8, 8, (B, E)), jnp.float32)
    v1 = v0 + jnp.asarray(rng.uniform(-8, 8, (B, E)), jnp.float32)
    draw = jnp.ones((B, E), bool)
    edge_layer = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)
    for max_visible in (None, 6):
        masks = rasterize_masks_packed_pallas_soa(
            u0, v0, u1, v1, draw, edge_layer, L, (H, W), 2,
            max_visible=max_visible, interpret=True,
        )
        rank = rasterize_rank_packed_soa(
            u0, v0, u1, v1, draw, edge_layer, L, (H, W), 2,
            max_visible=max_visible, interpret=True,
        )
        m = np.asarray(masks)
        expected = np.zeros((B, H, W), np.uint8)
        for l in range(L):
            expected = np.where(m[:, l] > 0, np.uint8(l + 1), expected)
        np.testing.assert_array_equal(np.asarray(rank), expected)
    assert np.asarray(rank).sum() > 0


@pytest.mark.parametrize("t,w", [(2, 160), (3, 96), (5, 160), (2, 96)])
def test_exact_stroke_kernel_bit_equal(t, w):
    """The exact-stroke Pallas pipeline (compact_env_exact_soa +
    rasterize_env_exact) is bit-equal to the dense stroke="exact" path
    (itself bit-exact vs cv2.polylines, tests/test_cv2_stroke.py) --
    lane split on and off, off-frame endpoints included."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        compact_env_exact_soa,
        rasterize_env_exact,
    )

    rng = np.random.default_rng(40 + t)
    H = 48
    B, E, L = 5, 24, 3
    # Two fuzz regimes: near-frame correlated endpoints (the original
    # domain) and DEEP-clipped independent endpoints (~+/-400 px off
    # frame). The deep regime produces direction-swapped scaled-clip
    # outline edges whose near-endpoint dot is not shared with any
    # other edge -- exactly the path the round-4 advisor found the
    # shallow domain never exercised (missing normalized-far dot).
    u0 = jnp.asarray(rng.uniform(-40, w + 60, (B, 1, E)), jnp.float64)
    v0 = jnp.asarray(rng.uniform(-40, 90, (B, 1, E)), jnp.float64)
    u1 = u0 + jnp.asarray(rng.uniform(-80, 80, (B, 1, E)), jnp.float64)
    v1 = v0 + jnp.asarray(rng.uniform(-40, 40, (B, 1, E)), jnp.float64)
    deep = rng.random((B, 1, E)) < 0.5
    du0 = rng.uniform(-400, w + 400, (B, 1, E))
    dv0 = rng.uniform(-400, H + 400, (B, 1, E))
    du1 = rng.uniform(-400, w + 400, (B, 1, E))
    dv1 = rng.uniform(-400, H + 400, (B, 1, E))
    u0 = jnp.where(deep, du0, u0)
    v0 = jnp.where(deep, dv0, v0)
    u1 = jnp.where(deep, du1, u1)
    v1 = jnp.where(deep, dv1, v1)
    # pinned regression: the advisor's missing-dot repro segment
    u0 = u0.at[0, 0, 0].set(150.0)
    v0 = v0.at[0, 0, 0].set(-151.0)
    u1 = u1.at[0, 0, 0].set(-378.0)
    v1 = v1.at[0, 0, 0].set(406.0)
    draw = jnp.asarray(rng.random((B, 1, E)) < 0.8)
    draw = draw.at[0, 0, 0].set(True)
    el = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)
    from tinycarlo_tpu.ops.rasterize_pallas import _n_xblocks

    soa = compact_env_exact_soa(
        u0, v0, u1, v1, draw, E * _n_xblocks(w), 16, H, t,
        edge_layer=el, n_layers=L, w=w,
    )
    got = rasterize_env_exact(soa, L, (H, w), t, interpret=True)
    lay = el[None, :] == jnp.arange(L)[:, None]
    p0 = jnp.stack([u0[:, 0], v0[:, 0]], -1)[:, None, :, :]
    p1 = jnp.stack([u1[:, 0], v1[:, 0]], -1)[:, None, :, :]
    dl = draw[:, 0][:, None, :] & lay[None]
    exp = jnp.stack(
        [
            ras.rasterize_masks(
                jnp.broadcast_to(p0[b], (L, E, 2)),
                jnp.broadcast_to(p1[b], (L, E, 2)),
                dl[b], (H, w), t, stroke="exact",
            )
            for b in range(B)
        ]
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
    assert np.asarray(exp).sum() > 0


def test_exact_stroke_auto_entry():
    """rasterize_masks_packed_pallas_soa(stroke='exact') routes the
    exact kernel and matches the dense exact path."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
    )

    rng = np.random.default_rng(77)
    H, W, t = 32, 160, 2
    B, E, L = 2, 16, 2
    u0 = jnp.asarray(rng.uniform(-10, W + 10, (B, E)), jnp.float64)
    v0 = jnp.asarray(rng.uniform(-10, H + 10, (B, E)), jnp.float64)
    u1 = u0 + jnp.asarray(rng.uniform(-50, 50, (B, E)), jnp.float64)
    v1 = v0 + jnp.asarray(rng.uniform(-20, 20, (B, E)), jnp.float64)
    draw = jnp.asarray(rng.random((B, E)) < 0.9)
    el = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)
    got = rasterize_masks_packed_pallas_soa(
        u0, v0, u1, v1, draw, el, L, (H, W), t, interpret=True,
        stroke="exact",
    )
    lay = el[None, :] == jnp.arange(L)[:, None]
    p0 = jnp.stack([u0, v0], -1)[:, None, :, :]
    p1 = jnp.stack([u1, v1], -1)[:, None, :, :]
    dl = draw[:, None, :] & lay[None]
    exp = jnp.stack(
        [
            ras.rasterize_masks(
                jnp.broadcast_to(p0[b], (L, E, 2)),
                jnp.broadcast_to(p1[b], (L, E, 2)),
                dl[b], (H, W), t, stroke="exact",
            )
            for b in range(B)
        ]
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_predecoded_soa_bit_equal():
    """compact_env_idx_soa(pre=True) -- the opt-in scalar-chain
    experiment arm (TINYCARLO_PREDEC=on, docs/KERNELS.md round-5) --
    is bit-equal to the production pre=False arm through both output
    kernels, including dead/off-frame copies (endpoint poisoning), the
    x8 overrun pads, oversubscription, and tall segments."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        _n_xblocks,
        compact_env_idx_soa,
        rasterize_env_idx,
    )

    rng = np.random.default_rng(55)
    B, E, L, H, W, t = 4, 40, 3, 48, 160, 2
    u0 = jnp.asarray(rng.uniform(-80, W + 80, (B, 1, E)), jnp.float64)
    v0 = jnp.asarray(rng.uniform(-80, H + 80, (B, 1, E)), jnp.float64)
    u1 = u0 + jnp.asarray(rng.uniform(-60, 60, (B, 1, E)), jnp.float64)
    v1 = v0 + jnp.asarray(rng.uniform(-60, 60, (B, 1, E)), jnp.float64)
    draw = jnp.asarray(rng.random((B, 1, E)) < 0.7)
    el = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)
    for k_budget in (E * _n_xblocks(W), 8 * _n_xblocks(W)):
        outs = []
        for pre in (False, True):
            soa = compact_env_idx_soa(
                u0.astype(jnp.float32), v0.astype(jnp.float32),
                u1.astype(jnp.float32), v1.astype(jnp.float32), draw,
                k_budget, 16, H, t, edge_layer=el, n_layers=L, w=W,
                pre=pre,
            )
            assert len(soa) == (9 if pre else 8)
            outs.append(np.asarray(rasterize_env_idx(
                soa, L, (H, W), t, gran=16, split=True, interpret=True
            )))
        np.testing.assert_array_equal(outs[0], outs[1])
        assert outs[0].sum() > 0
