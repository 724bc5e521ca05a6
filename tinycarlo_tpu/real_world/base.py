"""Real-world backend contract + the functional glue.

The reference swaps whole `Car`/`Camera` subclasses by reflection
(reference: tinycarlo/real_world/env.py:11-27, contract in
real_world/README.md:5-9). Here the simulation core is pure, so a
hardware backend only has to provide two things:

  * a `RealWorldCar`: send drive commands, report the tracked pose;
  * a `RealWorldCamera`: deliver observation frames (or None to fall back
    to the simulated camera rendered at the tracked pose -- the digital
    twin view).

`pose_step` injects an externally-tracked pose into the functional
`EnvState` and re-runs the map-relative machinery (local path, cte,
heading) exactly like the simulated step would -- it is the jitted
equivalent of the reference AutosysCar.step's find_local_path call
(env_autosys.py:133) -- and `snap_to_lanepath` mirrors
`Map.sample_nearest_edge` (map.py:71-84, 90-degree margin).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tinycarlo_tpu import car as car_mod
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu import geometry as geo


class RealWorldCar:
    """Hardware car interface. Subclass and implement the three methods."""

    def connect(self) -> None:
        """Open hardware connections; called once by the env."""

    def drive(self, velocity: float, steering: float, maneuver: int) -> None:
        """Send normalized [-1,1] commands (maneuver may drive blinkers)."""
        raise NotImplementedError

    def pose(self) -> Tuple[np.ndarray, float, float]:
        """Latest tracked (position_m (2,), rotation_rad, velocity_mps)."""
        raise NotImplementedError

    def stop(self) -> None:
        """Emergency/shutdown stop."""

    def reposition(self, target_position, target_rotation, guidance=None) -> None:
        """Optional automatic recovery toward a lanepath pose (the
        reference's history-replay / Stanley drive-back,
        env_autosys.py:135-178).

        `guidance`, when provided by the env, is the digital twin's map
        feedback for the drive-back controller:
        ``guidance(position, rotation, maneuver) -> (cte, heading_error,
        truncated, target_position, target_rotation)`` -- cte/heading
        relative to the lanepath edge nearest the given pose (the
        reference's get_info stream inside its reset loop,
        env_autosys.py:161-164), `truncated` whether the local-path walk
        dead-ends for that maneuver (the maneuver-retry signal,
        env_autosys.py:156-160), and the re-snapped target pose
        (env_autosys.py:167). Backends that only replay history may
        ignore it."""


class RealWorldCamera:
    """Hardware camera interface."""

    def connect(self) -> None:
        pass

    def capture(self) -> Optional[np.ndarray]:
        """An observation frame in the env's observation layout, or None
        to use the simulated camera at the tracked pose."""
        return None


def snap_to_lanepath(params: fenv.EnvParams, position, rotation):
    """Nearest lanepath edge within +/-90 degrees of `rotation`; returns
    (target_position, target_rotation, edge). Reference: map.py:71-84."""
    lp = params.map_data.lanepath
    position = jnp.asarray(position)
    idx = geo.nearest_edge_with_orientation_idx(
        lp.nodes, lp.edges, lp.edge_mask, position, jnp.asarray(rotation),
        margin_deg=90.0,
    )
    edge = lp.edges[jnp.maximum(idx, 0)]
    target = lp.nodes[edge[1]]
    target_rot = geo.edge_orientations(lp.nodes, edge)
    return np.asarray(target), float(target_rot), np.asarray(edge)


def pose_step(
    params: fenv.EnvParams,
    state: fenv.EnvState,
    position,
    rotation,
    velocity,
    maneuver,
):
    """Overwrite the car pose from tracking, refresh position_front, and
    run the maneuver-conditioned local-path walk. Returns (state,
    truncated)."""
    dtype = state.car.position.dtype
    car = state.car.replace(
        position=jnp.asarray(position, dtype),
        rotation=jnp.asarray(rotation, dtype),
        velocity=jnp.asarray(velocity, dtype),
    )
    car = car_mod.update_position_front(car, params.cfg.car)
    car, truncated = car_mod.find_local_path(
        params.map_data, car, jnp.asarray(maneuver, jnp.int32)
    )
    return state.replace(car=car), truncated


def make_guidance(params: fenv.EnvParams, state: fenv.EnvState):
    """The digital twin's map-feedback callback for
    `RealWorldCar.reposition` (see its docstring for the contract).

    Each call snaps the tracked pose onto the nearest lanepath edge
    (pose_reset), runs the maneuver-conditioned local-path walk
    (pose_step), and reads cte / heading_error from the same jitted info
    path the simulator uses -- the functional equivalent of the
    reference's reset-loop get_info + sample_nearest_edge stream
    (env_autosys.py:154-167)."""

    def guidance(position, rotation, maneuver):
        st = pose_reset(params, state, position, rotation)
        st, truncated = pose_step(
            params, st, position, rotation, 0.0, maneuver
        )
        import jax

        info = jax.device_get(fenv._info(params, st))
        tp, tr, _ = snap_to_lanepath(params, position, rotation)
        return (
            float(info["cte"]),
            float(info["heading_error"]),
            bool(truncated),
            np.asarray(tp),
            float(tr),
        )

    return guidance


def pose_reset(params: fenv.EnvParams, state: fenv.EnvState, position, rotation):
    """Reset the functional state onto the nearest lanepath edge at the
    tracked pose (reference AutosysCar.reset tail, env_autosys.py:170-178)."""
    _, _, edge = snap_to_lanepath(params, position, rotation)
    dtype = state.car.position.dtype
    car = state.car.replace(
        position=jnp.asarray(position, dtype),
        rotation=jnp.asarray(rotation, dtype),
        velocity=jnp.zeros((), dtype),
        steering_angle=jnp.zeros((), dtype),
        radius=jnp.zeros((), dtype),
        local_path=jnp.broadcast_to(jnp.asarray(edge, jnp.int32), state.car.local_path.shape).copy(),
        local_path_len=jnp.ones((), jnp.int32),
        last_maneuver=jnp.zeros((), jnp.int32),
    )
    car = car_mod.update_position_front(car, params.cfg.car)
    return state.replace(car=car)
