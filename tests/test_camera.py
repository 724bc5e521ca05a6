"""Camera pipeline tests: Rodrigues/extrinsic/intrinsic parity vs the
reference (which uses cv2.Rodrigues), and projection-geometry invariants.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.util import make_layer
from tinycarlo_tpu import camera as cam

CAM_CFG = dict(
    resolution=[128, 160],
    position=[0.0, -0.005, 0.04],
    orientation=[22, 0, 0],
    fov=80,
    max_range=0.5,
    line_thickness=2,
)


def test_rodrigues_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for _ in range(20):
        rvec = rng.normal(size=3)
        ours = np.asarray(cam.rodrigues(jnp.asarray(rvec)))
        ref, _ = cv2.Rodrigues(rvec)
        np.testing.assert_allclose(ours, ref, atol=1e-12)
    # zero vector -> identity
    np.testing.assert_array_equal(
        np.asarray(cam.rodrigues(jnp.zeros(3))), np.eye(3)
    )


@requires_reference
@pytest.mark.parametrize(
    "orientation,position,fov",
    [
        ((22, 0, 0), (0.0, -0.005, 0.04), 80),
        ((15, 5, -10), (0.01, 0.0, 0.05), 120),
        ((0, 0, 0), (0.0, 0.0, 0.0), 90),
    ],
)
def test_matrices_vs_reference(reference, orientation, position, fov):
    from tinycarlo.camera import Camera

    cfg = dict(CAM_CFG)
    cfg.update(orientation=list(orientation), position=list(position), fov=fov)
    ref = Camera(None, None, None, cfg)
    ours_e = np.asarray(
        cam.extrinsic_matrix(
            jnp.asarray(orientation, jnp.float64), jnp.asarray(position, jnp.float64)
        )
    )
    np.testing.assert_allclose(ours_e, ref.E, atol=1e-12)
    ours_k = np.asarray(
        cam.intrinsic_matrix(fov, tuple(cfg["resolution"]), jnp.float64)
    )
    np.testing.assert_allclose(ours_k, ref.K, atol=1e-12)


def test_world_to_body_matrix():
    pos = jnp.asarray([1.0, 2.0], jnp.float64)
    rot = jnp.asarray(0.5, jnp.float64)
    m = np.asarray(cam.car_world_to_body_matrix(pos, rot))
    # world point at the car position maps to the origin
    p = m @ np.array([1.0, 2.0, 0.0, 1.0])
    np.testing.assert_allclose(p[:3], 0, atol=1e-15)
    # a point ahead of the car maps onto +x
    ahead = np.array([1.0 + np.cos(0.5), 2.0 + np.sin(0.5), 0.0, 1.0])
    np.testing.assert_allclose((m @ ahead)[:3], [1.0, 0.0, 0.0], atol=1e-15)


def _project_simple(max_range=None, points=((1.0, -0.2), (1.0, 0.2))):
    """Camera at origin, pitch 0 -> looking along +x at z=0.05 height."""
    nodes, _, edges, emask = make_layer(list(points), [(0, 1)])
    e = cam.extrinsic_matrix(
        jnp.asarray([0.0, 0.0, 0.0], jnp.float64),
        jnp.asarray([0.0, 0.0, 0.05], jnp.float64),
    )
    k = cam.intrinsic_matrix(90.0, (128, 160), jnp.float64)
    body = cam.car_world_to_body_matrix(
        jnp.zeros(2, jnp.float64), jnp.zeros((), jnp.float64)
    )
    pose = e @ body
    return cam.project_layer(nodes, edges, emask, pose, k, (128, 160), max_range)


def test_project_visible_segment():
    p0, p1, draw = _project_simple()
    assert bool(draw[0])
    # symmetric segment about the optical axis -> endpoints mirror around cx
    assert float(p0[0, 0] + p1[0, 0]) == pytest.approx(160.0, abs=1e-9)
    # ground line ahead projects into the lower half of the image
    assert 64.0 < float(p0[0, 1]) < 128.0


def test_project_behind_camera_clipped():
    # one endpoint behind the camera -> still drawn (near-plane clip)
    p0, p1, draw = _project_simple(points=((1.0, 0.0), (-1.0, 0.1)))
    assert bool(draw[0])
    # both endpoints behind -> not drawn
    _, _, draw = _project_simple(points=((-1.0, 0.0), (-2.0, 0.1)))
    assert not bool(draw[0])


def test_project_max_range():
    # fully beyond range -> culled
    _, _, draw = _project_simple(max_range=0.5, points=((1.0, -0.2), (1.0, 0.2)))
    assert not bool(draw[0])
    # straddling the range boundary -> clipped but drawn
    _, _, draw = _project_simple(max_range=0.5, points=((0.3, 0.0), (1.0, 0.0)))
    assert bool(draw[0])


def test_project_out_of_frame():
    # both endpoints project outside the frame -> not drawn (reference
    # behavior: edges vanish once both endpoints leave the image)
    _, _, draw = _project_simple(points=((0.01, -5.0), (0.01, -4.0)))
    assert not bool(draw[0])
