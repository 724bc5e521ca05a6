"""Kinematic bicycle-model car as pure state-transition functions.

TPU-native re-design of the reference's mutable `Car` class
(reference: tinycarlo/car.py). All methods become pure functions
``f(map_data, config, state, ...) -> state'`` over a `CarState` pytree, so
the whole step vmaps over thousands of car instances and jits into one XLA
program. Data-dependent control flow (the local-path graph walk, u-turn
re-snap, truncation early-returns) is expressed as masked fixed-shape
selects.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tinycarlo_tpu import geometry as geo
from tinycarlo_tpu.config import CarConfig
from tinycarlo_tpu.map_compiler import MapData
from tinycarlo_tpu.utils.helper import clip_angle

LOOKAHEAD = 3  # reference find_local_path default (tinycarlo/car.py:127)
PATH_LEN = LOOKAHEAD + 1


@struct.dataclass
class CarState:
    position: jnp.ndarray  # (2,) middle of rear axle, meters (car.py:25)
    position_front: jnp.ndarray  # (2,) middle of front axle (car.py:26)
    rotation: jnp.ndarray  # () yaw in [-pi, pi]
    steering_angle: jnp.ndarray  # () degrees (post rate-limit)
    radius: jnp.ndarray  # () turn radius of last step (visual/ackermann)
    velocity: jnp.ndarray  # () m/s (post rate-limit)
    local_path: jnp.ndarray  # (PATH_LEN, 2) int32 lanepath edges
    local_path_len: jnp.ndarray  # () int32 valid prefix length
    last_maneuver: jnp.ndarray  # () int32


def car_reset(
    map_data: MapData, cfg: CarConfig, spawn_row: jnp.ndarray
) -> CarState:
    """Reset to spawn-table row `spawn_row` (caller samples the row).

    Mirrors reference Car.reset (tinycarlo/car.py:34-44): local_path starts
    as just the spawn edge, steering/velocity zeroed.
    """
    sp = map_data.spawns
    position = sp.position[spawn_row]
    rotation = sp.rotation[spawn_row]
    edge = sp.edge[spawn_row]
    dtype = position.dtype
    local_path = jnp.broadcast_to(edge, (PATH_LEN, 2)).astype(jnp.int32)
    return CarState(
        position=position,
        position_front=_front(position, rotation, cfg.wheelbase),
        rotation=rotation,
        steering_angle=jnp.zeros((), dtype),
        radius=jnp.zeros((), dtype),
        velocity=jnp.zeros((), dtype),
        local_path=local_path,
        local_path_len=jnp.ones((), jnp.int32),
        last_maneuver=jnp.zeros((), jnp.int32),
    )


def _front(position, rotation, wheelbase):
    return jnp.stack(
        [
            position[0] + wheelbase * jnp.cos(rotation),
            position[1] + wheelbase * jnp.sin(rotation),
        ]
    )


def update_position_front(state: CarState, cfg: CarConfig) -> CarState:
    """Reference: tinycarlo/car.py:167-168."""
    return state.replace(
        position_front=_front(state.position, state.rotation, cfg.wheelbase)
    )


def car_step(
    map_data: MapData,
    cfg: CarConfig,
    T: float,
    state: CarState,
    velocity_cmd: jnp.ndarray,
    steering_cmd: jnp.ndarray,
    maneuver: jnp.ndarray,
    uturn_hint: jnp.ndarray = None,
) -> Tuple[CarState, jnp.ndarray]:
    """One dt of bicycle kinematics + local-path tracking.

    Commands are in [-1, 1]; scaling/rate limits and the exact-arc pose
    integration mirror reference Car.step (tinycarlo/car.py:70-125),
    including its quirks: the rotation is wrapped with a single correction
    (not a loop), and wrapping happens only on the arc branch. Returns
    (new_state, truncated).
    """
    dt = T
    dtype = state.position.dtype

    new_velocity = velocity_cmd * cfg.max_velocity
    if cfg.max_acceleration is not None:
        # Reference gates on max_acceleration alone (car.py:83) and then
        # uses max_deceleration unconditionally; configs always set both.
        new_velocity = jnp.clip(
            new_velocity,
            state.velocity - cfg.max_deceleration * dt,
            state.velocity + cfg.max_acceleration * dt,
        )
    new_steering = steering_cmd * cfg.max_steering_angle
    if cfg.steering_speed is not None:
        new_steering = jnp.clip(
            new_steering,
            state.steering_angle - cfg.steering_speed * dt,
            state.steering_angle + cfg.steering_speed * dt,
        )

    vxn = jnp.cos(state.rotation)
    vyn = jnp.sin(state.rotation)
    straight = jnp.abs(new_steering) < 0.0001  # reference car.py:95

    # Straight branch (car.py:95-99).
    pos_straight = jnp.stack(
        [
            state.position[0] + new_velocity * vxn * dt,
            state.position[1] + new_velocity * vyn * dt,
        ]
    )

    # Arc branch (car.py:101-122) -- computed with a div-safe steering angle.
    steer_safe = jnp.where(straight, jnp.asarray(1.0, dtype), new_steering)
    radius = cfg.wheelbase / jnp.tan(jnp.radians(steer_safe))
    ang_vel = new_velocity / radius
    dyaw = ang_vel * dt
    nx, ny = vyn, -vxn
    tx = nx * radius
    ty = ny * radius
    c, s = jnp.cos(dyaw), jnp.sin(dyaw)
    rot_x = c * tx + (-s) * ty
    rot_y = s * tx + c * ty
    pos_arc = jnp.stack(
        [
            state.position[0] - tx + rot_x,
            state.position[1] - ty + rot_y,
        ]
    )
    rot_arc = state.rotation + dyaw
    rot_arc = jnp.where(rot_arc > math.pi, rot_arc - 2 * math.pi, rot_arc)
    rot_arc = jnp.where(rot_arc < -math.pi, rot_arc + 2 * math.pi, rot_arc)

    new_position = jnp.where(straight, pos_straight, pos_arc)
    new_rotation = jnp.where(straight, state.rotation, rot_arc)
    new_radius = jnp.where(straight, jnp.zeros((), dtype), radius)

    state = state.replace(
        position=new_position,
        rotation=new_rotation,
        steering_angle=new_steering,
        velocity=new_velocity,
        radius=new_radius,
    )
    state = update_position_front(state, cfg)
    return find_local_path(map_data, state, maneuver, uturn_hint)


def find_local_path(
    map_data: MapData,
    state: CarState,
    maneuver: jnp.ndarray,
    uturn_hint: jnp.ndarray = None,
) -> Tuple[CarState, jnp.ndarray]:
    """Masked fixed-shape version of reference find_local_path
    (tinycarlo/car.py:127-148).

    maneuver: 0 straight, 1 right, 2 u-turn, 3 left. The desired world-frame
    direction is the current edge orientation plus maneuver * pi/2. A fresh
    u-turn re-snaps to the nearest opposite-orientation edge; otherwise we
    walk to the nearest connected edge. The path is then extended LOOKAHEAD
    edges toward the desired direction (forward or backward depending on
    velocity sign). Any dead end -> truncated=True; on a failed *first* hop
    the previous path/last_maneuver are kept (the reference early-returns
    before mutating), while a failed extension keeps the partial path, both
    exactly as the reference does. The reference omits a None check on the
    u-turn re-snap (it would crash); we map that case to truncation.

    `uturn_hint`, if given, must be a traced bool that is True whenever
    this car *might* be entering a u-turn this step (any upper bound on
    is_uturn_entry is correct). Its purpose is batching: a vmapped caller
    passes `jnp.any(entering)` of the whole batch *unbatched* (vmap
    in_axes=None), which keeps the `lax.cond` below a real conditional,
    so the O(E) re-snap scan over the lanepath runs only on steps where
    some env actually switches into maneuver 2 -- exactly the steps the
    reference pays for it (car.py:130-133). With the default None the
    scan runs unconditionally: a per-car cond would turn into a
    both-branches select under vmap anyway, and measured ~4x slower than
    the straight-line scan at 4096 envs.
    """
    lp = map_data.lanepath
    maneuver = jnp.asarray(maneuver, jnp.int32)
    cur_edge = state.local_path[0]
    base_dir = clip_angle(
        geo.edge_orientations(lp.nodes, cur_edge) + maneuver * (math.pi / 2)
    )

    is_uturn_entry = (maneuver == 2) & (state.last_maneuver != 2)

    # U-turn re-snap (car.py:130-133), gated so the full-lanepath scan
    # only runs on steps where it can matter.
    def _resnap():
        return geo.nearest_edge_with_orientation_idx(
            lp.nodes, lp.edges, lp.edge_mask, state.position_front, base_dir
        ).astype(jnp.int32)

    if uturn_hint is None:
        ut_idx = _resnap()
    else:
        ut_idx = jax.lax.cond(
            uturn_hint, _resnap, lambda: jnp.asarray(-1, jnp.int32)
        )
    ut_edge = geo.take_rows(lp.edges, jnp.maximum(ut_idx, 0))
    ut_valid = ut_idx >= 0

    # Connected-edge walk (car.py:135-137).
    conn_edge, conn_valid = geo.nearest_connected_edge(
        lp.nodes,
        state.position_front,
        cur_edge,
        base_dir,
        lp.next_table,
        lp.next_count,
        lp.prev_table,
        lp.prev_count,
    )

    first_edge = jnp.where(is_uturn_entry, ut_edge, conn_edge)
    first_valid = jnp.where(is_uturn_entry, ut_valid, conn_valid)
    # After a u-turn re-snap the target direction flips (car.py:133).
    walk_dir = jnp.where(
        is_uturn_entry, clip_angle(base_dir + math.pi), base_dir
    )

    # Fixed-iteration lookahead extension (car.py:140-148).
    path = [first_edge]
    cur = first_edge
    ok = first_valid
    length = jnp.asarray(1, jnp.int32)
    fwd = state.velocity > 0
    for _ in range(LOOKAHEAD):
        base = jnp.where(fwd, cur[1], cur[0])
        nxt = geo.pick_node_given_orientation(
            lp.nodes, base, walk_dir,
            geo.take_rows(lp.next_table, base),
            geo.take_rows(lp.next_count, base),
        )
        step_ok = ok & (nxt >= 0)
        hop = jnp.stack([base, nxt])
        path.append(jnp.where(step_ok, hop, cur))
        cur = jnp.where(step_ok, hop, cur)
        length = length + step_ok.astype(jnp.int32)
        ok = step_ok

    new_path = jnp.stack(path).astype(jnp.int32)
    truncated = ~ok

    # A failed first hop leaves path & last_maneuver untouched (car.py:136-137).
    local_path = jnp.where(first_valid, new_path, state.local_path)
    local_path_len = jnp.where(first_valid, length, state.local_path_len)
    last_maneuver = jnp.where(first_valid, maneuver, state.last_maneuver)
    state = state.replace(
        local_path=local_path,
        local_path_len=local_path_len,
        last_maneuver=last_maneuver,
    )
    return state, truncated


def car_info(map_data: MapData, cfg: CarConfig, state: CarState):
    """Cross-track error, heading error, per-laneline distances.

    Mirrors reference Car.get_info (tinycarlo/car.py:46-67), including its
    mixed use of rear/front positions in the out-of-bounds branch, and the
    all-zeros "empty info" when the local path is shorter than 2 edges.

    Returns a dict of arrays:
      cte (), heading_error (), laneline_distances (L,),
      local_path (PATH_LEN, 2) coords, local_path_len (), velocity ().
    """
    lp = map_data.lanepath
    dtype = state.position.dtype
    has_path = state.local_path_len >= 2

    ref_edge = state.local_path[1]
    cte = geo.signed_distance_to_edge(lp.nodes, ref_edge, state.position_front)
    heading_error = clip_angle(
        geo.edge_orientations(lp.nodes, ref_edge) - state.rotation
    )

    # Per-laneline nearest-edge distances (car.py:56-64). The endpoint-
    # distance scan runs ONCE over the PACKED edge axis (all layers'
    # real edges concatenated, ~3.6x fewer slots than the padded
    # per-layer arrays on reference maps); the per-layer argmin is a
    # masked min over the packed axis. Selection is identical to the
    # reference's per-layer first-minimal scan: packing preserves each
    # layer's original edge order and argmin returns the first minimum.
    if map_data.laneline_grid is not None:
        # Spatial pruning: the same first-wins argmin evaluated over the
        # position's grid-cell candidate list instead of every edge. The
        # candidate construction guarantees every minimizer (and tie)
        # survives for any position inside the cell, and candidate order
        # is packed-edge order, so the selected edge -- and therefore
        # every emitted value -- is identical to the full scan within
        # the grid's domain (see map_compiler.LanelineGrid).
        g = map_data.laneline_grid
        pn = map_data.packed_nodes[0]
        pe = map_data.packed_edges[0]
        cx = jnp.clip(
            jnp.floor((state.position[0] - g.origin[0]) * g.inv_cell)
            .astype(jnp.int32), 0, g.nx - 1,
        )
        cy = jnp.clip(
            jnp.floor((state.position[1] - g.origin[1]) * g.inv_cell)
            .astype(jnp.int32), 0, g.ny - 1,
        )
        cell = cy * g.nx + cx
        # One-hot routing instead of a row gather: under vmap the
        # vector-matrix products lift to (B, C) x (C, K') MXU matmuls
        # (the same trick as the rasterizer compaction), where a batched
        # gather lowers to slow per-row dynamic slices. Exactness: each
        # one-hot row has a single 1.0, so the accumulated value is the
        # table entry bit-for-bit (Precision.HIGHEST keeps f32/f64
        # inputs unrounded).
        k_tot = g.cand_idx.shape[1]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (g.cand_idx.shape[0],), 0)
            == cell
        ).astype(state.position.dtype)
        tab = jnp.concatenate(
            [
                g.cand_idx.astype(state.position.dtype),
                g.cand_p0[..., 0], g.cand_p0[..., 1],
                g.cand_p1[..., 0], g.cand_p1[..., 1],
            ],
            axis=1,
        )  # (C, 5 * K)
        row = jnp.einsum(
            "c,ck->k", onehot, tab,
            precision=jax.lax.Precision.HIGHEST,
        )
        idxs = row[:k_tot].astype(jnp.int32)
        p0c = jnp.stack(
            [row[k_tot: 2 * k_tot], row[2 * k_tot: 3 * k_tot]], axis=-1
        )
        p1c = jnp.stack(
            [row[3 * k_tot: 4 * k_tot], row[4 * k_tot: 5 * k_tot]], axis=-1
        )
        d = jnp.abs(
            geo.distance(state.position, p0c)
            + geo.distance(state.position, p1c)
        )
        d = jnp.where(idxs >= 0, d, jnp.asarray(geo._BIG, d.dtype))
        gb = g.layer_bounds
        k_best = jnp.stack(
            [
                jnp.argmin(d[gb[l]: gb[l + 1]]) + gb[l]
                if gb[l + 1] > gb[l]
                # edgeless layer: match the full scan's fallback (packed
                # edge 0)
                else jnp.full((), -1, jnp.int32)
                for l in range(map_data.n_layers)
            ]
        )
        ne_idx = jnp.where(
            k_best >= 0,
            jnp.maximum(idxs[jnp.maximum(k_best, 0)], 0),
            0,
        )

        def edge_distance(ei):
            ne = geo.take_rows(pe, ei)
            inside = geo.within_edge_bounds(pn, ne, state.position)
            d_perp = jnp.abs(
                geo.signed_distance_to_edge(pn, ne, state.position)
            )
            d_node = jnp.minimum(
                geo.distance(state.position, geo.take_rows(pn, ne[0])),
                geo.distance(
                    state.position_front, geo.take_rows(pn, ne[1])
                ),
            )
            return jnp.where(inside, d_perp, d_node)

        distances = jax.vmap(edge_distance)(ne_idx)
    elif map_data.packed_edges is not None:
        pn = map_data.packed_nodes[0]
        pe = map_data.packed_edges[0]
        pm = map_data.packed_edge_mask[0]
        lay = map_data.packed_edge_layer
        p0, p1 = geo.edge_endpoints(pn, pe)
        d = jnp.abs(
            geo.distance(state.position, p0)
            + geo.distance(state.position, p1)
        )
        n_layers = map_data.n_layers
        bounds = map_data.packed_layer_bounds
        if bounds and len(bounds) == n_layers + 1:
            # Layer-contiguous packed axis with STATIC bounds: the
            # per-layer argmin is a small reduction over a static slice
            # (no (L, E) one-hot / masked broadcast). Selection stays
            # identical: slices exclude exactly the other-layer and
            # padded slots the mask sent to _BIG, and argmin keeps
            # first-wins order within the layer.
            ne_idx = jnp.stack(
                [
                    jnp.argmin(d[bounds[l]: bounds[l + 1]]) + bounds[l]
                    if bounds[l + 1] > bounds[l]
                    # edgeless layer: match the masked-argmin fallback
                    # (all-_BIG row -> first index)
                    else jnp.zeros((), jnp.int32)
                    for l in range(n_layers)
                ]
            )
        else:
            d = jnp.where(pm, d, jnp.asarray(geo._BIG, d.dtype))
            onehot_l = lay[None, :] == jnp.arange(
                n_layers, dtype=lay.dtype
            )[:, None]
            dl = jnp.where(
                onehot_l, d[None, :], jnp.asarray(geo._BIG, d.dtype)
            )
            ne_idx = jnp.argmin(dl, axis=1)  # (L,) packed-edge indices

        def edge_distance(ei):
            ne = pe[ei]
            inside = geo.within_edge_bounds(pn, ne, state.position)
            d_perp = jnp.abs(
                geo.signed_distance_to_edge(pn, ne, state.position)
            )
            d_node = jnp.minimum(
                geo.distance(state.position, pn[ne[0]]),
                geo.distance(state.position_front, pn[ne[1]]),
            )
            return jnp.where(inside, d_perp, d_node)

        distances = jax.vmap(edge_distance)(ne_idx)
    else:
        def layer_distance(nodes, edges, edge_mask):
            ne = edges[
                geo.nearest_edge_idx(nodes, edges, edge_mask, state.position)
            ]
            inside = geo.within_edge_bounds(nodes, ne, state.position)
            d_perp = jnp.abs(
                geo.signed_distance_to_edge(nodes, ne, state.position)
            )
            d_node = jnp.minimum(
                geo.distance(state.position, nodes[ne[0]]),
                geo.distance(state.position_front, nodes[ne[1]]),
            )
            return jnp.where(inside, d_perp, d_node)

        distances = jax.vmap(layer_distance)(
            map_data.laneline_nodes,
            map_data.laneline_edges,
            map_data.laneline_edge_mask,
        )

    zero = jnp.zeros((), dtype)
    return {
        "cte": jnp.where(has_path, cte, zero),
        "heading_error": jnp.where(has_path, heading_error, zero),
        "laneline_distances": jnp.where(has_path, distances, 0.0),
        "local_path": lp.nodes[state.local_path[:, 1]],
        "local_path_len": jnp.where(has_path, state.local_path_len, 0),
        "velocity": jnp.where(has_path, state.velocity, zero),
    }
