"""Gymnasium-compatible class API over the functional core.

Drop-in equivalent of the reference `TinyCarloEnv` (reference:
tinycarlo/env.py): same action/observation spaces, info dict, config
schema, render modes, and RNG stream (spawn sampling reproduces the
reference's seeded `np_random` draws exactly, rejections included). The
simulation itself runs as the jitted pure functions in
`tinycarlo_tpu.env`; this class only holds host-side state (RNG, render
windows, wrapper flags) and converts device arrays to Python scalars at
the boundary.

For throughput use `tinycarlo_tpu.vector.VecEnv` -- this shim exists for
API parity and single-env workflows.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium as gym
except ImportError:  # pragma: no cover
    gym = None

from tinycarlo_tpu import camera as cam
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.config import load_config
from tinycarlo_tpu.utils.helper import getenv


class _CarView:
    """Host-side view of car config + live state, so wrapper/example code
    written against the reference's `env.unwrapped.car` keeps working
    (e.g. `car.track_width` in wrapper/reward.py:22, wheel geometry in the
    overview renderer)."""

    def __init__(self, shim: "TinyCarloEnv"):
        self._shim = shim
        cfg = shim.params.cfg.car
        self.track_width = cfg.track_width
        self.wheelbase = cfg.wheelbase
        self.max_velocity = cfg.max_velocity
        self.max_steering_angle = cfg.max_steering_angle

    @property
    def position(self) -> np.ndarray:
        return np.asarray(self._shim.state.car.position)

    @property
    def position_front(self) -> np.ndarray:
        return np.asarray(self._shim.state.car.position_front)

    @property
    def rotation(self) -> float:
        return float(self._shim.state.car.rotation)

    @property
    def steering_angle(self) -> float:
        return float(self._shim.state.car.steering_angle)

    @property
    def velocity(self) -> float:
        return float(self._shim.state.car.velocity)

    @property
    def radius(self) -> float:
        return float(self._shim.state.car.radius)

    @property
    def local_path(self):
        st = self._shim.state.car
        n = int(st.local_path_len)
        return [tuple(int(i) for i in e) for e in np.asarray(st.local_path[:n])]


class _CameraView:
    """Mutable camera parameters + `update_params()`, mirroring the
    reference's domain-randomization hook (reference: camera.py:48-50,
    mutated in examples/train_stanley_il.py:53-57)."""

    def __init__(self, shim: "TinyCarloEnv"):
        self._shim = shim
        cfg = shim.params.cfg.camera
        self.resolution = list(cfg.resolution)
        self.position = list(cfg.position)
        self.orientation = list(cfg.orientation)
        self.fov = cfg.fov
        self.max_range = cfg.max_range
        self.line_thickness = cfg.line_thickness
        self._builder = None  # jitted matrix builder, created on first use

    def update_params(self) -> None:
        dtype = self._shim.params.camera.E.dtype
        if self._builder is None:
            self._builder = cam.matrix_builder(tuple(self.resolution), dtype)
        with self._shim._on_device():
            matrices = self._builder(
                np.asarray(self.orientation, dtype),
                np.asarray(self.position, dtype),
                np.asarray(self.fov, dtype),
            )
        if self._shim._device is not None:
            matrices = jax.device_put(matrices, self._shim._device)
        self._shim.params = self._shim.params.replace(camera=matrices)


class TinyCarloEnv(gym.Env if gym is not None else object):
    """Gymnasium env `"tinycarlo-v2"`. Reference: tinycarlo/env.py:15-180."""

    metadata: Dict[str, list] = {"render_modes": ["human", "rgb_array"]}

    def __init__(
        self,
        render_mode: Optional[str] = None,
        config: Optional[Union[str, Dict[str, Any]]] = None,
        dtype=jnp.float32,
        device: Optional[str] = "cpu",
    ):
        cfg, config_path = load_config(config)
        self.config_path = config_path
        self.config = config if isinstance(config, dict) else None
        if self.config is None:
            import yaml

            with open(config_path) as stream:
                self.config = yaml.safe_load(stream)

        # Device policy: the interactive single-env shim is dispatch-
        # latency bound (one host round trip per step), so it runs on the
        # host CPU backend by default -- a single env cannot use an
        # accelerator, and remote/tunneled chips add a network round trip
        # the reference (pure in-process Python, env.py:115-146) never
        # pays. `device=None` keeps the JAX default backend (e.g. to
        # share buffers with a TPU training loop); any explicit backend
        # name ("tpu", "cpu") pins to it. The batched `vector.VecEnv`
        # path is unaffected and always uses the default (accelerator)
        # backend.
        self._device = None
        if device is not None:
            try:
                self._device = jax.devices(device)[0]
            except RuntimeError:
                self._device = None  # backend unavailable: JAX default
        with self._on_device():
            self.params = fenv.make_env_params(
                cfg, dtype=dtype, base_path=config_path
            )
        if self._device is not None:
            self.params = jax.device_put(self.params, self._device)
        self.fps = cfg.sim.fps
        self.T = cfg.sim.T
        self.render_realtime = cfg.sim.render_realtime
        self.observation_space_format = cfg.sim.observation_space_format
        self.overview_pixel_per_meter = cfg.sim.overview_pixel_per_meter
        self.render_node_names = cfg.sim.render_node_names

        assert render_mode is None or render_mode in self.metadata["render_modes"]
        self.render_mode = render_mode
        self.no_observation = False
        self.wrapped = False  # set True by wrappers; disables default shaping
        self.loop_time: float = 1.0

        self.state: Optional[fenv.EnvState] = None
        self.car = _CarView(self)
        self.camera = _CameraView(self)
        self._window = None
        self._window_camera = None
        self._overview_cache = None

        # Host-side spawn parity: map lanepath node index -> spawn-table row
        # (-1 for dead ends / out-of-candidate nodes), so the reference's
        # rejection-sampling recursion (map.py:51-69) is replayed draw for
        # draw against the same seeded np_random stream.
        spawns = self.params.map_data.spawns
        self._n_lanepath_nodes = self.params.map_data.lanepath.n_nodes
        self._spawn_points = cfg.map.spawn_points
        node_to_row = np.full(self._n_lanepath_nodes, -1, dtype=np.int64)
        for row, node in enumerate(np.asarray(spawns.node_idx[: spawns.count])):
            node_to_row[node] = row
        self._node_to_row = node_to_row

        self._reset_fn = jax.jit(
            partial(fenv.reset, render=False), static_argnames=()
        )
        self._step_fn = jax.jit(
            fenv.step, static_argnames=("render", "wrapped")
        )
        self._render_obs_fn = jax.jit(
            fenv.render_observation, static_argnames=("fmt",)
        )
        # DEBUG-only staged functions (reference per-stage timing parity,
        # env.py:144-145); compiled lazily so normal runs pay nothing.
        self._debug_fns = None

        self.action_space = gym.spaces.Dict(
            {
                "car_control": gym.spaces.Box(-1, 1, shape=(2,), dtype=np.float32),
                "maneuver": gym.spaces.Discrete(4),
            }
        )
        self.observation_space = gym.spaces.Box(
            low=0,
            high=255,
            shape=fenv.observation_shape(self.params),
            dtype=np.uint8,
        )

        self.reset()

    # -- helpers -----------------------------------------------------------

    def _on_device(self):
        """Context manager pinning jnp array creation + jit compilation to
        the shim's device policy (no-op under `device=None`)."""
        if self._device is None:
            import contextlib

            return contextlib.nullcontext()
        return jax.default_device(self._device)

    def _sample_spawn_row(self) -> int:
        """Replay the reference RNG draw sequence (map.py:61-64)."""
        while True:
            if self._spawn_points is None:
                idx = int(
                    self.np_random.integers(
                        0, self._n_lanepath_nodes - 1, size=1, dtype=int
                    )[0]
                )
            else:
                idx = int(self.np_random.choice(np.asarray(self._spawn_points)))
            row = self._node_to_row[idx]
            if row >= 0:
                return int(row)

    def _get_obs(self) -> np.ndarray:
        if not self.no_observation or self.render_mode is not None:
            obs = self._render_obs_fn(self.params, self.state)
            return np.asarray(obs)
        return np.zeros(self.observation_space.shape, dtype=np.uint8)

    def _convert_info(self, info: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Host info pytree (already device_get) -> reference-shaped dict
        (env.py:83-85): laneline_distances keyed by layer name, local_path
        as a trimmed coordinate list."""
        names = self.params.map_data.laneline_names
        distances = np.asarray(info["laneline_distances"])
        n = int(info["local_path_len"])
        coords = np.asarray(info["local_path"])
        return {
            "cte": float(info["cte"]),
            "heading_error": float(info["heading_error"]),
            "position": np.asarray(info["position"]),
            "orientation": float(info["orientation"]),
            "laneline_distances": {
                name: float(d) for name, d in zip(names, distances)
            },
            "local_path": [coords[i] for i in range(n)] if n >= 2 else [],
            "velocity": float(info["velocity"]),
        }

    # -- gym API -----------------------------------------------------------

    def reset(
        self, seed: Optional[int] = None, options: Optional[Any] = None
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        if gym is not None:
            super().reset(seed=seed)
        row = self._sample_spawn_row()
        with self._on_device():
            self.state, _, info = self._reset_fn(
                self.params, jax.random.PRNGKey(0), jnp.asarray(row)
            )
            observation = self._get_obs()
        # single host<->device round-trip for the whole info pytree
        info = jax.device_get(info)
        if self.render_mode == "human":
            self._render_frame()
        return observation, self._convert_info(info)

    def step(self, action: Dict[str, Any]):
        st = time.perf_counter()
        control = np.clip(np.asarray(action["car_control"], np.float64), -1, 1)
        with self._on_device():
            act = {
                "car_control": jnp.asarray(control),
                "maneuver": jnp.asarray(int(action["maneuver"])),
            }
            want_obs = (
                not self.no_observation or self.render_mode is not None
            )
            import os as _os

            # DEBUG=1: staged step timings (reference env.py:144-145);
            # DEBUG=2: additionally per-layer camera timings
            # (reference camera.py:99-109)
            dbg = getenv("DEBUG") or _os.environ.get("DEBUG") == "2"
        if dbg:
            with self._on_device():
                observation, reward, terminated, truncated, info = (
                    self._step_debug(act, want_obs, st)
                )
        else:
            # ONE fused device dispatch for car step + obs render + info and
            # ONE device->host transfer per step (matters when the chip sits
            # behind a network tunnel: each dispatch pays the ~ms round trip)
            with self._on_device():
                self.state, obs_dev, reward, terminated, truncated, info = (
                    self._step_fn(
                        self.params,
                        self.state,
                        act,
                        render=want_obs,
                        wrapped=self.wrapped,
                    )
                )
            if want_obs:
                observation, reward, terminated, truncated, info = (
                    jax.device_get(
                        (obs_dev, reward, terminated, truncated, info)
                    )
                )
            else:
                reward, terminated, truncated, info = jax.device_get(
                    (reward, terminated, truncated, info)
                )
                observation = np.zeros(
                    self.observation_space.shape, dtype=np.uint8
                )
        if self.render_mode == "human":
            self._render_frame()
        self.loop_time = time.perf_counter() - st
        return (
            np.asarray(observation),
            float(reward),
            bool(terminated),
            bool(truncated),
            self._convert_info(info),
        )

    def _step_debug(self, act, want_obs: bool, st: float):
        """DEBUG=1 staged step with the reference's per-stage timing prints
        (env.py:144-145 all/obs/info/car-step line; camera.py:99-109 stage
        breakdown). Stages dispatch separately so the timings are honest --
        slower than the fused production path by design. The per-LAYER
        camera loop timings have no analogue here (projection is batched
        over layers in one op), so the camera line reports the fused
        projection and rasterize stages instead."""
        if self._debug_fns is None:
            from tinycarlo_tpu import car as car_mod

            def car_only(params, state, action):
                control = jnp.clip(action["car_control"], -1.0, 1.0)
                car_state, truncated = car_mod.car_step(
                    params.map_data, params.cfg.car, params.cfg.sim.T,
                    state.car, control[0], control[1], action["maneuver"],
                )
                return state.replace(car=car_state), truncated

            def project_only(params, state):
                return fenv._project_all_layers(params, state.car)

            def project_one(params, state, l):
                md = params.map_data
                body = cam.car_world_to_body_matrix(
                    state.car.position, state.car.rotation
                )
                pose = params.camera.E @ body
                return cam.project_layer(
                    md.laneline_nodes[l], md.laneline_edges[l],
                    md.laneline_edge_mask[l], pose, params.camera.K,
                    params.cfg.camera.resolution, params.cfg.camera.max_range,
                )

            def raster_one(params, p0, p1, draw):
                from tinycarlo_tpu.ops import rasterize as ras

                return ras.rasterize_masks_auto(
                    p0[None], p1[None], draw[None],
                    params.cfg.camera.resolution,
                    params.cfg.camera.line_thickness,
                    max_visible=params.cfg.camera.max_visible_segments,
                    stroke=params.cfg.camera.stroke,
                )

            self._debug_fns = {
                "car": jax.jit(car_only),
                "info": jax.jit(fenv._info),
                "project": jax.jit(project_only),
                "project_one": jax.jit(project_one, static_argnames=("l",)),
                "raster_one": jax.jit(raster_one),
            }

        st_step = time.perf_counter()
        self.state, truncated = jax.block_until_ready(
            self._debug_fns["car"](self.params, self.state, act)
        )
        td_step = time.perf_counter() - st_step

        st_obs = time.perf_counter()
        if want_obs:
            import os as _os

            if _os.environ.get("DEBUG") == "2":
                # per-LAYER staging (reference camera.py:99-109 prints
                # transform/clip/range/render per laneline layer; here
                # projection is one fused op per layer, so the line
                # reports project | rasterize per layer)
                names = self.params.map_data.laneline_names
                for l, name in enumerate(names):
                    st_l = time.perf_counter()
                    p0, p1, draw = jax.block_until_ready(
                        self._debug_fns["project_one"](
                            self.params, self.state, l
                        )
                    )
                    td_p = time.perf_counter() - st_l
                    jax.block_until_ready(
                        self._debug_fns["raster_one"](
                            self.params, p0, p1, draw
                        )
                    )
                    print(
                        f"camera layer {name}: project {td_p*1000:.4f} ms"
                        f" | rasterize "
                        f"{(time.perf_counter()-st_l-td_p)*1000:.4f} ms"
                    )
            jax.block_until_ready(
                self._debug_fns["project"](self.params, self.state)
            )
            td_project = time.perf_counter() - st_obs
            observation = np.asarray(
                self._render_obs_fn(self.params, self.state)
            )
            td_obs = time.perf_counter() - st_obs
            print(
                f"obs projection: {td_project*1000:.4f} ms | "
                f"render (projection+rasterize fused): "
                f"{(td_obs-td_project)*1000:.4f} ms"
            )
        else:
            observation = np.zeros(self.observation_space.shape, np.uint8)
            td_obs = time.perf_counter() - st_obs

        st_info = time.perf_counter()
        info = jax.device_get(self._debug_fns["info"](self.params, self.state))
        td_info = time.perf_counter() - st_info

        cte = float(info["cte"])
        tw = self.params.cfg.car.track_width
        if self.wrapped:
            reward, terminated = 0.0, False
        else:  # reference env.py:87-99
            reward = max((-1.0 / tw) * cte + 1.0, 0.0)
            terminated = cte > tw * 10
        print(
            f"all: {(time.perf_counter() - st)*1000:.2f} ms | "
            f"obs render {td_obs*1000:.2f} ms | info {td_info*1000:.2f} ms | "
            f"car step {td_step*1000:.2f} ms"
        )
        return observation, reward, terminated, bool(truncated), info

    def render(self) -> Optional[np.ndarray]:
        if self.render_mode == "rgb_array":
            return self._render_frame()
        return None

    def _camera_rgb(self) -> np.ndarray:
        return np.asarray(self._render_obs_fn(self.params, self.state, fmt="rgb"))

    def _render_frame(self) -> Optional[np.ndarray]:
        camera_view = self._camera_rgb()
        if self.render_mode != "human":
            return camera_view
        import cv2

        from tinycarlo_tpu.viz import render_overview

        if self._window is None:
            self._window = "Map"
            cv2.namedWindow(self._window, cv2.WINDOW_NORMAL)
        if self._window_camera is None:
            self._window_camera = "Camera"
            cv2.namedWindow(self._window_camera, cv2.WINDOW_NORMAL)
        overview, self._overview_cache = render_overview(
            self.params,
            self.state,
            self.overview_pixel_per_meter,
            render_node_names=self.render_node_names,
            static_cache=self._overview_cache,
        )
        cv2.imshow(self._window, overview)
        cv2.imshow(self._window_camera, camera_view)
        waiting_time = self.T - self.loop_time
        if waiting_time < 0.001 or not self.render_realtime:
            waiting_time = 0.001
        cv2.waitKey(int(waiting_time * 1000))
        return None

    def close(self) -> None:
        if self._window is not None or self._window_camera is not None:
            import cv2

            if self._window is not None:
                cv2.destroyWindow(self._window)
            if self._window_camera is not None:
                cv2.destroyWindow(self._window_camera)
