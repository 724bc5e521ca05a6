"""Gymnasium env bridging the functional core to real hardware.

Registered as `"tinycarlo-realworld-v2"` (reference: tinycarlo/__init__.py:4).
Backends resolve like the reference (reference: real_world/env.py:11-27):
`sim.real_world_env: <name>` in the config selects
`tinycarlo_tpu.real_world.environments.env_<name>`, whose RealWorldCar /
RealWorldCamera subclasses are discovered by reflection; backends may also
be registered programmatically via `register_backend`.

Each step: send commands to the hardware car, read the tracked pose,
inject it into the functional EnvState (`pose_step`), and compute
info/reward/termination from the map exactly like the simulator. The
observation comes from the hardware camera, falling back to the simulated
camera rendered at the tracked pose (digital-twin view).
"""
from __future__ import annotations

import importlib
import inspect
import time
from typing import Any, Dict, Optional, Tuple, Type, Union

import jax
import jax.numpy as jnp
import numpy as np

from tinycarlo_tpu.gym_env import TinyCarloEnv
from tinycarlo_tpu.real_world.base import (
    RealWorldCamera,
    RealWorldCar,
    make_guidance,
    pose_reset,
    pose_step,
    snap_to_lanepath,
)

_REGISTRY: Dict[str, Tuple[Type[RealWorldCar], Type[RealWorldCamera]]] = {}


def register_backend(
    name: str, car_cls: Type[RealWorldCar], camera_cls: Type[RealWorldCamera]
) -> None:
    _REGISTRY[name.lower()] = (car_cls, camera_cls)


def _resolve(name: str):
    name = name.lower()
    if name in _REGISTRY:
        return _REGISTRY[name]
    module = importlib.import_module(
        f"tinycarlo_tpu.real_world.environments.env_{name}"
    )
    cars = [
        c
        for _, c in inspect.getmembers(module, inspect.isclass)
        if issubclass(c, RealWorldCar) and c is not RealWorldCar
    ]
    cams = [
        c
        for _, c in inspect.getmembers(module, inspect.isclass)
        if issubclass(c, RealWorldCamera) and c is not RealWorldCamera
    ]
    if not cars or not cams:
        raise ValueError(
            f"backend env_{name} must define RealWorldCar and "
            f"RealWorldCamera subclasses"
        )
    return cars[0], cams[0]


class TinyCarloRealWorldEnv(TinyCarloEnv):
    """Digital-twin env: simulated map/rewards around a hardware car."""

    def __init__(
        self,
        render_mode: Optional[str] = None,
        config: Optional[Union[str, Dict[str, Any]]] = None,
        dtype=jnp.float32,
        backend: Optional[Tuple[RealWorldCar, RealWorldCamera]] = None,
    ):
        self._hw_car: Optional[RealWorldCar] = None
        self._hw_camera: Optional[RealWorldCamera] = None
        self._backend_override = backend
        super().__init__(render_mode=render_mode, config=config, dtype=dtype)

    # the base __init__ calls reset(); lazily connect hardware there
    def _ensure_backend(self) -> None:
        if self._hw_car is not None:
            return
        if self._backend_override is not None:
            self._hw_car, self._hw_camera = self._backend_override
        else:
            name = self.params.cfg.sim.real_world_env
            if name is None:
                raise ValueError(
                    "sim.real_world_env missing from config; use the normal "
                    "tinycarlo-v2 env instead"
                )
            car_cls, cam_cls = _resolve(name)
            self._hw_car, self._hw_camera = car_cls(), cam_cls()
        self._hw_car.connect()
        self._hw_camera.connect()

    def _get_obs(self) -> np.ndarray:
        frame = self._hw_camera.capture() if self._hw_camera else None
        if frame is not None:
            return np.asarray(frame, np.uint8)
        return super()._get_obs()  # digital-twin view at the tracked pose

    def reset(self, seed: Optional[int] = None, options: Optional[Any] = None):
        self._ensure_backend()
        # seed gym RNG without running the simulated spawn
        import gymnasium as gym

        gym.Env.reset(self, seed=seed)
        position, rotation, _velocity = self._hw_car.pose()
        target_pos, target_rot, _ = snap_to_lanepath(
            self.params, position, rotation
        )
        if self.state is None:
            # build an initial state pytree via the simulated reset
            self.state, _, _ = self._reset_fn(
                self.params, jax.random.PRNGKey(0), jnp.asarray(0)
            )
        # hand the backend the digital twin's map feedback so its
        # drive-back controller (reference env_autosys.py:154-167) can
        # run without the backend holding the map; legacy backends with
        # a 2-arg reposition still work
        if "guidance" in inspect.signature(self._hw_car.reposition).parameters:
            self._hw_car.reposition(
                target_pos, target_rot,
                guidance=make_guidance(self.params, self.state),
            )
        else:
            self._hw_car.reposition(target_pos, target_rot)
        position, rotation, _velocity = self._hw_car.pose()
        self.state = pose_reset(self.params, self.state, position, rotation)
        observation = self._get_obs()
        from tinycarlo_tpu import env as fenv

        info = jax.device_get(fenv._info(self.params, self.state))
        if self.render_mode == "human":
            self._render_frame()
        return observation, self._convert_info(info)

    def step(self, action: Dict[str, Any]):
        st = time.perf_counter()
        control = np.clip(np.asarray(action["car_control"], np.float64), -1, 1)
        maneuver = int(action["maneuver"])
        self._hw_car.drive(float(control[0]), float(control[1]), maneuver)
        position, rotation, velocity = self._hw_car.pose()
        self.state, truncated = pose_step(
            self.params, self.state, position, rotation, velocity, maneuver
        )
        observation = self._get_obs()
        from tinycarlo_tpu import env as fenv

        info = jax.device_get(fenv._info(self.params, self.state))
        cte = float(info["cte"])
        if self.wrapped:
            reward, terminated = 0.0, False
        else:
            reward = float(fenv.default_reward(self.params, jnp.asarray(cte)))
            terminated = bool(
                fenv.default_termination(self.params, jnp.asarray(cte))
            )
        if self.render_mode == "human":
            self._render_frame()
        self.loop_time = time.perf_counter() - st
        return (
            observation,
            reward,
            terminated,
            bool(truncated),
            self._convert_info(info),
        )

    def close(self) -> None:
        if self._hw_car is not None:
            self._hw_car.stop()
        super().close()
