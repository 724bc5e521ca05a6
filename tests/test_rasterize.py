"""Rasterizer tests: tiled == dense bit-equality, and golden-image
agreement vs cv2.polylines (the reference's rasterizer,
renderer.py:36-51), measured as IoU over random segment sets.
cv2 thick lines are not a published spec, so parity is bounded-difference:
IoU thresholds encode the calibrated agreement level.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tinycarlo_tpu.ops import rasterize as ras

RES = (128, 160)


def _random_segments(rng, n, spread=200.0):
    p0 = rng.uniform(-spread * 0.2, spread, size=(1, n, 2))
    p1 = p0 + rng.normal(scale=60.0, size=(1, n, 2))
    draw = rng.uniform(size=(1, n)) < 0.8
    return jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(draw)


def _cv2_frame(p0, p1, draw, thickness):
    cv2 = pytest.importorskip("cv2")
    frame = np.zeros(RES, np.uint8)
    a = np.int32(np.clip(np.asarray(p0[0]), -1e6, 1e6))
    b = np.int32(np.clip(np.asarray(p1[0]), -1e6, 1e6))
    for i in range(a.shape[0]):
        if bool(draw[0, i]):
            cv2.polylines(frame, np.int32([[a[i], b[i]]]), False, 255, thickness)
    return frame


def _iou(x, y):
    x = x > 0
    y = y > 0
    union = np.logical_or(x, y).sum()
    if union == 0:
        return 1.0
    return np.logical_and(x, y).sum() / union


@pytest.mark.parametrize(
    "thickness,min_iou", [(2, 0.84), (3, 0.89), (4, 0.89), (5, 0.90)]
)
def test_vs_cv2_iou(thickness, min_iou):
    """t >= 2 agreement with the calibrated rectangle-body + end-cap
    stroke (rasterize._split_radii); the residual is cv2's per-scanline
    polygon-fill pixel conventions. Thickness 1 is tested separately as
    bit-exact."""
    rng = np.random.default_rng(7)
    ious = []
    for _ in range(6):
        p0, p1, draw = _random_segments(rng, 24)
        ours = np.asarray(ras.rasterize_masks(p0, p1, draw, RES, thickness))[0]
        ref = _cv2_frame(p0, p1, draw, thickness)
        ious.append(_iou(ours, ref))
    assert np.mean(ious) > min_iou, f"mean IoU {np.mean(ious):.3f}"


def test_vs_cv2_thickness1_bit_exact():
    """Thickness 1 reproduces cv2.polylines bit for bit: the exact
    clipLine replica (rasterize._clip_line_cv2, double arithmetic like
    cv2's own) + the closed-form 8-connected LineIterator DDA
    (_bresenham_hit), verified here over random frames whose segments
    freely leave the image (clip-distorted endpoints included)."""
    pytest.importorskip("cv2")
    rng = np.random.default_rng(21)
    total = 0
    for _ in range(8):
        p0, p1, draw = _random_segments(rng, 24)
        ours = np.asarray(ras.rasterize_masks(p0, p1, draw, RES, 1))[0]
        ref = _cv2_frame(p0, p1, draw, 1)
        np.testing.assert_array_equal(ours, ref)
        total += int((ref > 0).sum())
    assert total > 1000  # the comparison actually drew lines


def test_vs_cv2_thickness1_huge_coords_bit_exact():
    """Near-plane-clipped projections hand cv2 coordinates around 1e9;
    the clipLine replica must still match bit for bit (float64 path)."""
    pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    p0 = jnp.asarray(rng.uniform(-1e9, 1e9, size=(1, 40, 2)))
    p1 = jnp.asarray(rng.uniform(-30, 170, size=(1, 40, 2)))
    draw = jnp.ones((1, 40), bool)
    ours = np.asarray(ras.rasterize_masks(p0, p1, draw, RES, 1))[0]
    ref = _cv2_frame(p0, p1, draw, 1)
    np.testing.assert_array_equal(ours, ref)
    assert (ref > 0).sum() > 50


def test_tiled_equals_dense():
    rng = np.random.default_rng(3)
    for thickness in (1, 2):
        p0, p1, draw = _random_segments(rng, 40)
        dense = np.asarray(ras.rasterize_masks(p0, p1, draw, RES, thickness))
        tiled = np.asarray(ras.rasterize_masks_tiled(p0, p1, draw, RES, thickness))
        np.testing.assert_array_equal(dense, tiled)


def test_empty_draw():
    p0 = jnp.zeros((2, 4, 2))
    p1 = jnp.ones((2, 4, 2))
    draw = jnp.zeros((2, 4), bool)
    out = np.asarray(ras.rasterize_masks(p0, p1, draw, RES, 1))
    assert out.shape == (2, *RES)
    assert out.sum() == 0


def test_rgb_composite_order():
    # two overlapping layers: later layer wins at overlaps (cv2 sequential)
    p0 = jnp.asarray([[[10.0, 10.0]], [[10.0, 10.0]]])
    p1 = jnp.asarray([[[50.0, 10.0]], [[50.0, 10.0]]])
    draw = jnp.ones((2, 1), bool)
    colors = jnp.asarray([[255, 0, 0], [0, 255, 0]])
    rgb = np.asarray(ras.rasterize_rgb(p0, p1, draw, colors, RES, 1))
    assert rgb[10, 30].tolist() == [0, 255, 0]


def test_degenerate_point_segment():
    # zero-length segment paints a dot, not NaNs
    p0 = jnp.asarray([[[20.0, 20.0]]])
    p1 = jnp.asarray([[[20.0, 20.0]]])
    draw = jnp.ones((1, 1), bool)
    out = np.asarray(ras.rasterize_masks(p0, p1, draw, RES, 2))
    assert out[0, 20, 20] == 255
    assert 0 < out.sum() < 255 * 30
