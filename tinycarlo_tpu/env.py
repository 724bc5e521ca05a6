"""Functional environment core: pure reset/step over pytrees.

TPU-native re-design of the reference `TinyCarloEnv` (reference:
tinycarlo/env.py). The env is a pair of pure functions

    reset(params, key)          -> (state, obs, info)
    step(params, state, action) -> (state, obs, reward, terminated,
                                    truncated, info)

over an `EnvState` pytree, so a batch of environments is just `vmap`, a
pod-slice of environments is `shard_map`, and the whole rollout jits into
one XLA program. The Gymnasium-compatible class API lives in
`tinycarlo_tpu.gym_env`; reward/termination/observation shaping live in
`tinycarlo_tpu.wrapper` as composable pure functions.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct

from tinycarlo_tpu import camera as cam
from tinycarlo_tpu import car as car_mod
from tinycarlo_tpu.config import EnvConfig, load_config
from tinycarlo_tpu.map_compiler import MapData, compile_map
from tinycarlo_tpu.ops import rasterize as ras


@struct.dataclass
class EnvParams:
    """Everything the pure functions need: compiled map + camera matrices
    (pytree leaves, so they can be donated/sharded/randomized) and the
    static config (hashable aux data selecting the compiled program).
    """

    map_data: MapData
    camera: cam.CameraMatrices
    cfg: EnvConfig = struct.field(pytree_node=False, default=None)


@struct.dataclass
class EnvState:
    car: car_mod.CarState
    key: jnp.ndarray  # per-env PRNG key driving respawns


def make_env_params(
    config: Union[str, Dict[str, Any], EnvConfig],
    dtype=jnp.float32,
    base_path: Optional[str] = None,
) -> EnvParams:
    """Compile a reference-schema config (dict / yaml path / EnvConfig)
    into EnvParams. Mirrors TinyCarloEnv.__init__ construction order
    (env.py:47-51) minus the human-render machinery. `base_path` anchors
    relative map json paths (the yaml's own path when config is a file,
    reference map.py:15-16).
    """
    if isinstance(config, EnvConfig):
        cfg, config_path = config, base_path
    else:
        cfg, config_path = load_config(config)
        config_path = config_path or base_path
    map_data = compile_map(cfg.map, base_path=config_path, dtype=dtype)
    matrices = cam.build_camera_matrices(cfg.camera, dtype=dtype)
    return EnvParams(map_data=map_data, camera=matrices, cfg=cfg)


def observation_shape(params: EnvParams) -> Tuple[int, ...]:
    """Reference: env.py:68-73."""
    h, w = params.cfg.camera.resolution
    fmt = params.cfg.sim.observation_space_format
    if fmt == "rgb":
        return (h, w, 3)
    if fmt == "rgb_planar":
        # extension: channel-planar rgb -- same pixels as "rgb"
        # transposed; the HWC layout materializes at 11-19 GB/s on v5e
        # vs ~150-230 GB/s planar (docs/KERNELS.md round-4), so this is
        # the throughput rgb contract
        return (3, h, w)
    if fmt == "rank":
        # extension: paint-order layer-rank map (0 = background, l+1 =
        # layer l on top, renderer.py:41-43) -- the information content
        # of an rgb frame at ONE byte/pixel. The uint8 store floor is
        # the measured per-chip ceiling for the mask formats
        # (docs/KERNELS.md round-5 conclusion: further gains need a
        # different observation contract); rank writes 1/L of classes'
        # bytes. Decode with ops.rasterize.rgb_from_rank /
        # rgb_planar_from_rank / classes_from_rank.
        return (h, w)
    return (params.map_data.n_layers, h, w)


def _project_all_layers(params: EnvParams, car_state) -> Tuple[jnp.ndarray, ...]:
    """Project every laneline layer through the car-mounted camera:
    (L, E, 2) pixel endpoints x2 + (L, E) draw mask (camera.py:52-95)."""
    cfg = params.cfg
    md = params.map_data
    body = cam.car_world_to_body_matrix(car_state.position, car_state.rotation)
    pose = params.camera.E @ body  # (3,4), camera.py:61

    def project(nodes, edges, edge_mask):
        return cam.project_layer(
            nodes,
            edges,
            edge_mask,
            pose,
            params.camera.K,
            cfg.camera.resolution,
            cfg.camera.max_range,
        )

    return jax.vmap(project)(
        md.laneline_nodes, md.laneline_edges, md.laneline_edge_mask
    )


def _masks_to_obs(params: EnvParams, masks, draw_bundle, fmt):
    if fmt == "classes":
        return masks
    if fmt == "rank":
        return ras.rank_from_masks(masks)
    if fmt == "rgb_planar":
        return ras.rasterize_rgb_planar(
            masks, params.map_data.laneline_colors
        )
    p0, p1, draw = draw_bundle
    return ras.rasterize_rgb(
        p0,
        p1,
        draw,
        params.map_data.laneline_colors,
        params.cfg.camera.resolution,
        params.cfg.camera.line_thickness,
        masks=masks,
        stroke=params.cfg.camera.stroke,
    )


def render_observation(
    params: EnvParams,
    state: EnvState,
    fmt: Optional[str] = None,
) -> jnp.ndarray:
    """Render the camera frame for the current state.

    Equivalent of Camera.capture_frame + Renderer.render_camera_frame_*
    (camera.py:52-110, renderer.py:36-51): project every laneline layer
    through the camera rigidly attached to the car, then rasterize.
    """
    cfg = params.cfg
    fmt = fmt or cfg.sim.observation_space_format
    p0, p1, draw = _project_all_layers(params, state.car)

    def render_with(k):
        return ras.rasterize_masks_auto(
            p0, p1, draw, cfg.camera.resolution, cfg.camera.line_thickness,
            max_visible=k, stroke=cfg.camera.stroke,
        )

    small_k = 32
    budget = cfg.camera.max_visible_segments
    if (
        ras._effective_platform() != "tpu"
        and (budget is None or budget > small_k)
    ):
        # Single-env CPU path (the interactive gym shim): the tiled
        # rasterizer's cost scales with the slot budget, but typical
        # frames draw ~10-25 segments per layer. Render with a small
        # budget and fall back to the configured one only when a layer
        # actually draws more -- compact_visible keeps the first k drawn
        # segments, so "every layer's drawn count <= k" guarantees a
        # bit-identical frame. lax.cond executes ONE branch here
        # (unbatched); batched rollouts use render_observation_batch and
        # never reach this. (A vmap over render_observation would turn
        # the cond into both-branches select -- correct, just slower.)
        drawn_max = jnp.max(jnp.sum(draw, axis=-1))
        masks = jax.lax.cond(
            drawn_max <= small_k,
            lambda: render_with(small_k),
            lambda: render_with(budget),
        )
    else:
        masks = render_with(budget)
    return _masks_to_obs(params, masks, (p0, p1, draw), fmt)


def _project_packed_batch_soa(params: EnvParams, states: EnvState):
    """Project the PACKED edge axis (all layers' real edges concatenated)
    for a batch of states: (B, Ep) u0/v0/u1/v1 coords + (B, Ep) draw.
    Projection and compaction scan sum(E_l) slots instead of
    L * max(E_l) -- ~3x fewer on reference maps, whose per-layer edge
    counts are skewed."""
    cfg = params.cfg
    md = params.map_data
    body = jax.vmap(cam.car_world_to_body_matrix)(
        states.car.position, states.car.rotation
    )
    pose = jnp.einsum("ij,bjk->bik", params.camera.E, body)  # (B, 3, 4)
    u0, v0, u1, v1, draw = cam.project_layers_batch_soa(
        md.packed_nodes,
        md.packed_edges,
        md.packed_edge_mask,
        pose,
        params.camera.K,
        cfg.camera.resolution,
        cfg.camera.max_range,
    )  # (B, 1, Ep) each
    return u0[:, 0], v0[:, 0], u1[:, 0], v1[:, 0], draw[:, 0]


def _project_packed_batch(params: EnvParams, states: EnvState):
    """Stacked-point view of `_project_packed_batch_soa`:
    (B, Ep, 2) x2 endpoints + (B, Ep) draw mask."""
    u0, v0, u1, v1, draw = _project_packed_batch_soa(params, states)
    return (
        jnp.stack([u0, v0], axis=-1),
        jnp.stack([u1, v1], axis=-1),
        draw,
    )


def check_segment_overflow(params: EnvParams, states: EnvState) -> jnp.ndarray:
    """Per-env count of rasterizer slot copies dropped by the
    `CameraConfig.max_visible_segments` budget at the current states.

    The reference draws unbounded segment lists (renderer.py:41-43) and
    can never drop; our fixed budget can. Run this (jittable, batched)
    on representative states -- e.g. under DEBUG, or once per eval -- to
    verify the budget fits the map/camera density. Nonzero means
    observation pixels were silently lost; raise
    `max_visible_segments` (or set it to None) until it is zero.
    """
    from tinycarlo_tpu.ops.rasterize_pallas import segment_overflow

    cfg = params.cfg
    p0, p1, draw = _project_packed_batch(params, states)
    return segment_overflow(
        p0, p1, draw, cfg.camera.resolution, cfg.camera.line_thickness,
        cfg.camera.max_visible_segments, stroke=cfg.camera.stroke,
    )


def render_observation_batch(
    params: EnvParams,
    states: EnvState,  # batched leaves (B, ...)
    fmt: Optional[str] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Batched observation rendering: projection vmaps over envs, but the
    rasterizer sees the whole (B, L, E) segment batch at once so the TPU
    path uses the fused one-instance-per-env multilayer kernel (a plain
    `vmap(render_observation)` would fall back to per-frame instances).

    `out_dtype=None` keeps the env observation contract (uint8, 0/255 for
    classes). A float `out_dtype` (classes format only) emits 0/1 masks
    straight from the kernel for in-graph consumers -- the frozen-encoder
    feature path in train/td3_loop -- skipping the uint8 materialization
    and the downstream /255 conversion entirely.
    """
    cfg = params.cfg
    fmt = fmt or cfg.sim.observation_space_format
    md = params.map_data
    if out_dtype is not None and fmt != "classes":
        raise ValueError("float out_dtype is only defined for classes masks")
    u0, v0, u1, v1, draw = _project_packed_batch_soa(params, states)
    import os as _os

    if (
        fmt in ("rgb", "rgb_planar", "rank")
        and ras._effective_platform() == "tpu"
        and _os.environ.get("TINYCARLO_RGB", "rank") == "rank"
        and not (cfg.camera.stroke == "exact"
                 and cfg.camera.line_thickness >= 2)
    ):
        # rgb fast path: the rank kernel emits a (B, H, W) layer-rank
        # map (1/5th the output bytes of the per-layer masks) and the
        # palette composite reads that instead of re-reading the masks
        # -- identical frames (rasterize.rgb_from_rank). fmt="rank"
        # returns the rank map itself: the 1-byte/pixel observation
        # contract (see observation_shape).
        from tinycarlo_tpu.ops.rasterize_pallas import (
            rasterize_rank_packed_soa,
        )

        rank = rasterize_rank_packed_soa(
            u0, v0, u1, v1, draw, md.packed_edge_layer, md.n_layers,
            cfg.camera.resolution, cfg.camera.line_thickness,
            max_visible=cfg.camera.max_visible_segments,
            layer_bounds=md.packed_layer_bounds or None,
        )
        if fmt == "rank":
            return rank
        if fmt == "rgb_planar":
            return ras.rgb_planar_from_rank(rank, md.laneline_colors)
        return ras.rgb_from_rank(rank, md.laneline_colors)
    masks = ras.rasterize_masks_packed_auto_soa(
        u0, v0, u1, v1, draw, md.packed_edge_layer, md.n_layers,
        cfg.camera.resolution, cfg.camera.line_thickness,
        max_visible=cfg.camera.max_visible_segments,
        layer_bounds=md.packed_layer_bounds or None,
        out_dtype=out_dtype if out_dtype is not None else jnp.uint8,
        stroke=cfg.camera.stroke,
    )
    if fmt == "classes":
        return masks
    if fmt == "rank":
        # CPU / exact-stroke fallback: rank derived from the full masks
        # (bit-identical to the TPU rank kernel's map; paint order =
        # layer order, renderer.py:41-43)
        return ras.rank_from_masks(masks)
    if fmt == "rgb_planar":
        return ras.rasterize_rgb_planar(masks, md.laneline_colors)
    # rgb: composite the class masks by layer color (rasterize_rgb with
    # masks given never touches the endpoint arrays)
    return jax.vmap(
        lambda m: _masks_to_obs(params, m, (None, None, None), fmt)
    )(masks)


def _info(params: EnvParams, state: EnvState) -> Dict[str, jnp.ndarray]:
    """Reference info dict (env.py:83-85)."""
    info = car_mod.car_info(params.map_data, params.cfg.car, state.car)
    info["position"] = state.car.position
    info["orientation"] = state.car.rotation
    return info


def default_reward(params: EnvParams, cte: jnp.ndarray) -> jnp.ndarray:
    """Linear shaping on (signed) cte; reference env.py:87-93 feeds the
    signed value, so negative cte yields reward > 1 -- replicated as-is.
    """
    tw = params.cfg.car.track_width
    return jnp.maximum((-1.0 / tw) * cte + 1.0, 0.0)


def default_termination(params: EnvParams, cte: jnp.ndarray) -> jnp.ndarray:
    """Reference env.py:95-99 (signed comparison, also as-is)."""
    return cte > params.cfg.car.track_width * 10


def reset(
    params: EnvParams,
    key: jnp.ndarray,
    spawn_row: Optional[jnp.ndarray] = None,
    render: bool = True,
) -> Tuple[EnvState, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Spawn the car at a random (or given) spawn-table row.

    Reference: env.py:101-113 / car.py:34-44 / map.py:51-69. The spawn
    distribution (uniform over valid spawn candidates) matches the
    reference's rejection sampling; `spawn_row` lets the Gymnasium shim
    reproduce the reference's exact np_random stream.
    """
    key, sub = jax.random.split(key)
    if spawn_row is None:
        spawn_row = jax.random.randint(sub, (), 0, params.map_data.spawns.count)
    car_state = car_mod.car_reset(params.map_data, params.cfg.car, spawn_row)
    state = EnvState(car=car_state, key=key)
    obs = (
        render_observation(params, state)
        if render
        else jnp.zeros(observation_shape(params), jnp.uint8)
    )
    return state, obs, _info(params, state)


def step(
    params: EnvParams,
    state: EnvState,
    action: Dict[str, jnp.ndarray],
    render: bool = True,
    wrapped: bool = False,
    uturn_hint: jnp.ndarray = None,
):
    """One environment step. Reference: env.py:115-146.

    `action` = {"car_control": (2,) in [-1,1], "maneuver": () int32}.
    `wrapped=True` reproduces the reference's wrapper flag (env.py:136-138):
    default reward/termination are disabled and the caller's wrapper stack
    supplies them. `uturn_hint` gates the u-turn re-snap scan for batched
    callers (see car.find_local_path).
    """
    control = jnp.clip(action["car_control"], -1.0, 1.0)  # env.py:118
    car_state, truncated = car_mod.car_step(
        params.map_data,
        params.cfg.car,
        params.cfg.sim.T,
        state.car,
        control[0],
        control[1],
        action["maneuver"],
        uturn_hint,
    )
    state = state.replace(car=car_state)
    obs = (
        render_observation(params, state)
        if render
        else jnp.zeros(observation_shape(params), jnp.uint8)
    )
    info = _info(params, state)
    cte = info["cte"]
    if wrapped:
        reward = jnp.zeros_like(cte)
        terminated = jnp.zeros_like(truncated)
    else:
        reward = default_reward(params, cte)
        terminated = default_termination(params, cte)
    return state, obs, reward, terminated, truncated, info
