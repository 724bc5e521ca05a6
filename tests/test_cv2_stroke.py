"""Bit-exactness of the thickness >= 2 cv2 stroke replica
(ops/cv2_stroke.py) and its integration as stroke="exact" in the
dense/tiled rasterizers. The reference rasterizes with cv2.polylines
(tinycarlo/renderer.py:41-43); under float64 (this suite's dtype) the
exact mode must reproduce its pixel set bit for bit."""
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tinycarlo_tpu.ops import rasterize as ras
from tinycarlo_tpu.ops.cv2_stroke import (
    cap_radius,
    cap_table,
    thick_hit,
    thick_params,
    thick_stroke_mask_ref,
)


def _cv2_mask(segs, t, h, w):
    img = np.zeros((h, w), np.uint8)
    for p0, p1 in segs:
        cv2.polylines(
            img, [np.array([p0, p1], np.int32)], False, 255, t
        )
    return img > 0


@pytest.mark.parametrize("thickness", [2, 3, 4, 5])
def test_host_oracle_bit_exact(thickness):
    rng = np.random.default_rng(thickness)
    h, w = 48, 64
    for it in range(150):
        dom = [60, 300, 100_000, 2_000_000_000][it % 4]
        p0 = (int(rng.integers(-dom, dom)), int(rng.integers(-dom, dom)))
        p1 = (int(rng.integers(-dom, dom)), int(rng.integers(-dom, dom)))
        ref = _cv2_mask([(p0, p1)], thickness, h, w)
        got = thick_stroke_mask_ref(p0, p1, thickness, (h, w))
        np.testing.assert_array_equal(ref, got, err_msg=f"{p0} {p1}")


@pytest.mark.parametrize("thickness", [2, 3, 4, 5])
def test_jnp_predicate_bit_exact(thickness):
    """Vectorized params+hit vs cv2, float64 (segments batched)."""
    rng = np.random.default_rng(thickness + 10)
    h, w = 48, 64
    n = 64
    for dom in (60, 300, 100_000):
        a = rng.integers(-dom, dom, (n, 2)).astype(float)
        b = rng.integers(-dom, dom, (n, 2)).astype(float)
        params = thick_params(
            jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
            jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1]),
            thickness, (h, w),
        )
        ys = jnp.arange(h, dtype=jnp.float64)[:, None, None]
        xs = jnp.arange(w, dtype=jnp.float64)[None, :, None]
        hits = np.asarray(thick_hit(xs, ys, params, thickness))
        for i in range(n):
            ref = _cv2_mask([(a[i], b[i])], thickness, h, w)
            np.testing.assert_array_equal(
                ref, hits[..., i], err_msg=f"{a[i]} {b[i]}"
            )


@pytest.mark.parametrize("thickness", [2, 3, 5])
def test_dense_and_tiled_exact_stroke(thickness):
    """rasterize_masks / rasterize_masks_tiled with stroke="exact" ==
    cv2.polylines over multi-segment layers (incl. off-frame and
    far-off-frame endpoints)."""
    rng = np.random.default_rng(thickness + 20)
    h, w = 48, 64
    for it in range(25):
        e = 8
        p0 = rng.integers(-60, 240, (1, e, 2)).astype(float)
        p1 = rng.integers(-60, 240, (1, e, 2)).astype(float)
        draw = rng.random((1, e)) < 0.8
        ref = _cv2_mask(
            [(p0[0, i], p1[0, i]) for i in range(e) if draw[0, i]],
            thickness, h, w,
        )
        dense = ras.rasterize_masks(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(draw),
            (h, w), thickness, stroke="exact",
        )
        tiled = ras.rasterize_masks_tiled(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(draw),
            (h, w), thickness, stroke="exact",
        )
        np.testing.assert_array_equal(np.asarray(dense[0]) > 0, ref)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(tiled))


def test_exact_stroke_through_env_observation():
    """End-to-end: an env with camera.stroke='exact' (t=2, the shipped
    configs' thickness) renders observations bit-equal to the reference
    renderer's cv2 rasterization of the same projected segments."""
    from tests.conftest import SIMPLE_LAYOUT_MAP
    from tinycarlo_tpu import env as fenv

    cfg = {
        "sim": {"fps": 30, "observation_space_format": "classes"},
        "car": {"wheelbase": 0.0487, "track_width": 0.027,
                "max_velocity": 0.15, "max_steering_angle": 30},
        "camera": {"position": [0.0, -0.005, 0.04],
                   "orientation": [22, 0, 0], "resolution": [64, 96],
                   "fov": 80, "max_range": 0.5, "line_thickness": 2,
                   "stroke": "exact"},
        "map": {"json_path": SIMPLE_LAYOUT_MAP, "pixel_per_meter": 450},
    }
    params = fenv.make_env_params(cfg, dtype=jnp.float64)
    assert params.cfg.camera.stroke == "exact"
    import jax

    state = fenv.reset(params, jax.random.key(3))[0]
    obs = fenv.render_observation(params, state)
    # oracle: same projected segments through cv2.polylines
    p0, p1, draw = fenv._project_all_layers(params, state.car)
    p0n, p1n, dn = map(np.asarray, (p0, p1, draw))
    h, w = params.cfg.camera.resolution
    for l in range(p0n.shape[0]):
        segs = []
        for e2 in range(p0n.shape[1]):
            if dn[l, e2]:
                a = np.clip(p0n[l, e2], -1e6, 1e6).astype(np.int64)
                b = np.clip(p1n[l, e2], -1e6, 1e6).astype(np.int64)
                segs.append((a, b))
        ref = _cv2_mask(segs, 2, h, w)
        np.testing.assert_array_equal(
            np.asarray(obs[l]) > 0, ref, err_msg=f"layer {l}"
        )


def test_cap_tables():
    assert cap_table(1) == (1, 0)
    assert cap_table(2) == (2, 1, 0)
    assert cap_table(3) == (3, 2, 2, 0)
    assert [cap_radius(t) for t in (2, 3, 4, 5)] == [1, 2, 2, 3]
