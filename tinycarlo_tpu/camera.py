"""Pinhole camera simulation: matrices + batched segment projection.

TPU-native re-design of the reference `Camera` (reference:
tinycarlo/camera.py). The reference clips/projects with per-edge Python
loops and cv2.Rodrigues; here the whole pipeline -- world->camera transform,
near-plane clipping, range clipping, perspective projection, visibility --
is a fixed-shape vectorized function over the padded laneline arrays,
vmappable over layers and over thousands of envs. Rodrigues is implemented
directly (no cv2 in the compute path) and is jax-traceable, so camera
domain randomization can run under jit.

Axis conventions follow the reference exactly: the extrinsic composes an
axis-angle rotation of (pitch-90deg, roll, 0) with one of (0, 0, yaw+90deg)
(camera.py:145-156); in the resulting frame the z-axis points *behind* the
camera, so "in front" means depth < 0 (camera.py:70), and the perspective
divide by the negative depth flips the image upright.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from tinycarlo_tpu.config import CameraConfig

NEAR_EPS = -1e-7  # reference near-plane target z (camera.py:112)


@struct.dataclass
class CameraMatrices:
    """Extrinsic (3,4) and intrinsic (3,3) as a pytree, so they can be
    rebuilt on-device for domain randomization (reference update_params,
    camera.py:48-50, randomized in examples/train_stanley_il.py:53-57).
    """

    E: jnp.ndarray  # (3, 4)
    K: jnp.ndarray  # (3, 3)


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle rotation vector -> 3x3 rotation matrix.

    Matches cv2.Rodrigues for a rotation vector input (used by the
    reference at camera.py:152-153): theta = |rvec|, axis = rvec/theta,
    R = cos(t) I + (1-cos(t)) a a^T + sin(t) [a]_x; identity at theta=0.
    """
    theta = jnp.sqrt(jnp.sum(rvec**2))
    safe_theta = jnp.where(theta == 0, 1.0, theta)
    a = rvec / safe_theta
    c, s = jnp.cos(theta), jnp.sin(theta)
    aat = jnp.outer(a, a)
    zero = jnp.zeros((), rvec.dtype)
    skew = jnp.array(
        [
            [zero, -a[2], a[1]],
            [a[2], zero, -a[0]],
            [-a[1], a[0], zero],
        ]
    )
    eye = jnp.eye(3, dtype=rvec.dtype)
    r = c * eye + (1 - c) * aat + s * skew
    return jnp.where(theta == 0, eye, r)


def extrinsic_matrix(
    orientation_deg: jnp.ndarray, position: jnp.ndarray
) -> jnp.ndarray:
    """Build the (3,4) extrinsic. Reference: camera.py:145-156."""
    dtype = jnp.result_type(orientation_deg, position)
    offset = jnp.asarray([-90.0, 0.0, 90.0], dtype)
    angles = jnp.radians(jnp.asarray(orientation_deg, dtype) + offset)
    r_pr = rodrigues(angles * jnp.asarray([1.0, 1.0, 0.0], dtype))
    r_y = rodrigues(angles * jnp.asarray([0.0, 0.0, 1.0], dtype))
    trans = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), -jnp.asarray(position, dtype)[:, None]], axis=1
    )
    return r_pr @ r_y @ trans


def intrinsic_matrix(
    fov_deg: float, resolution: Tuple[int, int], dtype=jnp.float32
) -> jnp.ndarray:
    """Build the (3,3) intrinsic from fov. Reference: camera.py:158-178."""
    h, w = resolution
    fov = jnp.radians(jnp.asarray(fov_deg, dtype))
    fx = w / (2 * jnp.tan(fov / 2))
    fy = h / (2 * jnp.tan(fov / 2))
    z = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    return jnp.stack(
        [
            jnp.stack([fx, z, jnp.asarray(w / 2, dtype)]),
            jnp.stack([z, fy, jnp.asarray(h / 2, dtype)]),
            jnp.stack([z, z, one]),
        ]
    )


def matrix_builder(resolution: Tuple[int, int], dtype=jnp.float32):
    """A jitted (orientation_deg(3,), position(3,), fov()) -> CameraMatrices
    builder. One compile instead of dozens of eager dispatches -- this is
    also what per-episode camera domain randomization calls (reference
    update_params, camera.py:48-50)."""
    import jax

    def build(orientation, position, fov):
        return CameraMatrices(
            E=extrinsic_matrix(orientation, position),
            K=intrinsic_matrix(fov, resolution, dtype),
        )

    return jax.jit(build)


def build_camera_matrices(cfg: CameraConfig, dtype=jnp.float32) -> CameraMatrices:
    import numpy as np

    return matrix_builder(tuple(cfg.resolution), dtype)(
        np.asarray(cfg.orientation, dtype),
        np.asarray(cfg.position, dtype),
        np.asarray(cfg.fov, dtype),
    )


def car_world_to_body_matrix(position: jnp.ndarray, rotation: jnp.ndarray):
    """4x4 world->car transform (inverse pose). Reference: car.py:159-165."""
    dtype = position.dtype
    c = jnp.cos(-rotation)
    s = jnp.sin(-rotation)
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    r = jnp.stack(
        [
            jnp.stack([c, -s, zero, zero]),
            jnp.stack([s, c, zero, zero]),
            jnp.stack([zero, zero, one, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )
    t = jnp.stack(
        [
            jnp.stack([one, zero, zero, -position[0]]),
            jnp.stack([zero, one, zero, -position[1]]),
            jnp.stack([zero, zero, one, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )
    return r @ t


def _point_on_line_at_z(p_keep: jnp.ndarray, p_move: jnp.ndarray, target_z):
    """Move p_move along the segment (p_keep, p_move) to depth target_z.

    Reference: camera.py:112-122 (arguments in the same keep/move order).
    """
    direction = p_keep - p_move
    dz = direction[..., 2]
    safe_dz = jnp.where(dz == 0, 1.0, dz)
    t = (target_z - p_move[..., 2]) / safe_dz
    return p_move + t[..., None] * direction


def project_layers_batch_soa(
    nodes: jnp.ndarray,  # (L, N, 2) shared map nodes
    edges: jnp.ndarray,  # (L, E, 2) int32
    edge_mask: jnp.ndarray,  # (L, E)
    camera_pose: jnp.ndarray,  # (B, 3, 4) per-env E @ world->car
    K: jnp.ndarray,  # (3, 3) shared intrinsics
    resolution: Tuple[int, int],
    max_range: Optional[float],
):
    """Batched-SoA equivalent of `project_layer`: all layers of all envs
    at once, returning ((B, L, E) u0, v0, u1, v1 pixel coords and a
    (B, L, E) draw mask) -- every coordinate its own array.

    Same math as `project_layer` (see its docstring for the reference
    mapping), restructured for the TPU memory layout: instead of
    (..., E, 3) point arrays -- whose 3-vector sits on the 128-lane axis
    at 2% utilization -- every coordinate is its own (B, L, E) array with
    the segment axis on lanes. Edge endpoints are gathered from the node
    table once (shared across envs) and transformed by per-env pose rows
    broadcast from (B, 1, 1); z==0 for all world points, so the pose's
    third column drops out entirely. The SoA return (rather than
    stacking into (..., 2) point arrays whose minor dim defeats the
    (8, 128) tiling) keeps the whole projection -> compaction pipeline
    fusable; `project_layers_batch` stacks for callers that want the
    point-array view.
    """
    h, w = resolution
    # (L, E) static endpoint gather, shared across the batch
    ex0 = jnp.take_along_axis(nodes[..., 0], edges[..., 0], axis=-1)
    ey0 = jnp.take_along_axis(nodes[..., 1], edges[..., 0], axis=-1)
    ex1 = jnp.take_along_axis(nodes[..., 0], edges[..., 1], axis=-1)
    ey1 = jnp.take_along_axis(nodes[..., 1], edges[..., 1], axis=-1)

    def coef(r, c):
        return camera_pose[:, r, c][:, None, None]  # (B, 1, 1)

    def to_cam(x, y):
        cx = coef(0, 0) * x + coef(0, 1) * y + coef(0, 3)
        cy = coef(1, 0) * x + coef(1, 1) * y + coef(1, 3)
        cz = coef(2, 0) * x + coef(2, 1) * y + coef(2, 3)
        return cx, cy, cz  # (B, L, E) each

    ax, ay, az = to_cam(ex0, ey0)
    bx, by, bz = to_cam(ex1, ey1)

    def clip_to(move, keep, target_z):
        """Move (move) along the segment toward (keep) to depth target_z;
        returns clipped coords. Mirrors _point_on_line_at_z."""
        mx, my, mz = move
        kx, ky, kz = keep
        dz = kz - mz
        t = (target_z - mz) / jnp.where(dz == 0, 1.0, dz)
        return mx + t * (kx - mx), my + t * (ky - my), jnp.full_like(mz, target_z)

    def select3(c, new, old):
        return tuple(jnp.where(c, n, o) for n, o in zip(new, old))

    near = jnp.asarray(NEAR_EPS, az.dtype)
    a = (ax, ay, az)
    b = (bx, by, bz)
    front0 = az < 0
    front1 = bz < 0
    clip0 = (~front0) & front1
    clip1 = front0 & (~front1)
    a = select3(clip0, clip_to(a, b, near), a)
    b = select3(clip1, clip_to(b, a, near), b)
    front0 = front0 | clip0
    front1 = front1 | clip1

    if max_range is not None:
        zmax = jnp.asarray(-max_range, az.dtype)
        in0 = a[2] > zmax
        in1 = b[2] > zmax
        rclip0 = (~in0) & in1
        rclip1 = in0 & (~in1)
        a = select3(rclip0, clip_to(a, b, zmax), a)
        b = select3(rclip1, clip_to(b, a, zmax), b)
        in0 = in0 | rclip0
        in1 = in1 | rclip1
    else:
        in0 = jnp.ones_like(front0)
        in1 = jnp.ones_like(front1)

    fx, fy = K[0, 0], K[1, 1]
    cx_, cy_ = K[0, 2], K[1, 2]
    skew = K[0, 1]

    def proj(p):
        # divide (not reciprocal-multiply): keeps the perspective divide
        # bit-identical to project_layer's `uv / safe_w`
        x, y, z = p
        zs = jnp.where(z == 0, 1.0, z)
        u = (fx * x + skew * y + cx_ * z) / zs
        v = (fy * y + cy_ * z) / zs
        return u, v

    u0, v0 = proj(a)
    u1, v1 = proj(b)

    def in_frame(u, v):
        return (u > 0) & (u < w) & (v > 0) & (v < h)

    vis0 = in_frame(u0, v0) & front0 & in0
    vis1 = in_frame(u1, v1) & front1 & in1
    draw = edge_mask & (vis0 | vis1)
    return u0, v0, u1, v1, draw


def project_layers_batch(
    nodes: jnp.ndarray,
    edges: jnp.ndarray,
    edge_mask: jnp.ndarray,
    camera_pose: jnp.ndarray,
    K: jnp.ndarray,
    resolution: Tuple[int, int],
    max_range: Optional[float],
):
    """`project_layers_batch_soa` with the endpoints stacked into
    ((B, L, E, 2) p0/p1, (B, L, E) draw) point arrays for callers that
    index points (overflow checks, the dense rasterizers)."""
    u0, v0, u1, v1, draw = project_layers_batch_soa(
        nodes, edges, edge_mask, camera_pose, K, resolution, max_range
    )
    p0 = jnp.stack([u0, v0], axis=-1)
    p1 = jnp.stack([u1, v1], axis=-1)
    return p0, p1, draw


def project_layer(
    nodes: jnp.ndarray,
    edges: jnp.ndarray,
    edge_mask: jnp.ndarray,
    camera_pose: jnp.ndarray,
    K: jnp.ndarray,
    resolution: Tuple[int, int],
    max_range: Optional[float],
):
    """Project one laneline layer into image-space segments.

    Returns (p0, p1, draw): (E,2) pixel-space endpoints and an (E,) bool
    draw mask. Follows reference capture_frame (camera.py:52-110):

      * lift nodes to z=0, transform by camera_pose (3,4) homogeneous;
      * near-plane clip straddling edges to z = -1e-7;
      * range clip straddling edges to z = -max_range;
      * project via K and perspective divide;
      * an endpoint is visible iff in-front AND in-range AND strictly
        inside the frame; an edge is drawn iff either endpoint is visible.

    One deliberate deviation: the reference mutates the *shared* node array
    while clipping, so when several edges share a behind-camera node the
    last edge's clip point wins for all of them (camera.py:71-77). We clip
    per-edge (each edge gets its own correct intersection), which is
    geometrically consistent; image parity is validated as bounded pixel
    difference, not bit equality.
    """
    h, w = resolution
    # World (x, y, 0, 1) -> camera frame. (N,4) @ (4,3) -> (N,3).
    ones = jnp.ones_like(nodes[..., :1])
    zeros = jnp.zeros_like(nodes[..., :1])
    pts = jnp.concatenate([nodes, zeros, ones], axis=-1)
    cam = pts @ camera_pose.T  # (N, 3)

    p0 = cam[edges[..., 0]]  # (E, 3)
    p1 = cam[edges[..., 1]]

    near = jnp.asarray(NEAR_EPS, cam.dtype)
    front0 = p0[..., 2] < 0
    front1 = p1[..., 2] < 0
    clip0 = (~front0) & front1
    clip1 = front0 & (~front1)
    p0 = jnp.where(clip0[..., None], _point_on_line_at_z(p1, p0, near), p0)
    p1 = jnp.where(clip1[..., None], _point_on_line_at_z(p0, p1, near), p1)
    front0 = front0 | clip0
    front1 = front1 | clip1

    if max_range is not None:
        zmax = jnp.asarray(-max_range, cam.dtype)
        in0 = p0[..., 2] > zmax
        in1 = p1[..., 2] > zmax
        rclip0 = (~in0) & in1
        rclip1 = in0 & (~in1)
        p0 = jnp.where(rclip0[..., None], _point_on_line_at_z(p1, p0, zmax), p0)
        p1 = jnp.where(rclip1[..., None], _point_on_line_at_z(p0, p1, zmax), p1)
        in0 = in0 | rclip0
        in1 = in1 | rclip1
    else:
        in0 = jnp.ones_like(front0)
        in1 = jnp.ones_like(front1)

    def proj(p):
        uvw = p @ K.T
        safe_w = jnp.where(uvw[..., 2] == 0, 1.0, uvw[..., 2])
        return uvw[..., :2] / safe_w[..., None]

    uv0 = proj(p0)
    uv1 = proj(p1)

    def in_frame(uv):
        return (
            (uv[..., 0] > 0) & (uv[..., 0] < w) & (uv[..., 1] > 0) & (uv[..., 1] < h)
        )

    vis0 = in_frame(uv0) & front0 & in0
    vis1 = in_frame(uv1) & front1 & in1
    draw = edge_mask & (vis0 | vis1)
    return uv0, uv1, draw
