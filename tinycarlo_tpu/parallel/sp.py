"""Segment-parallel (SP) rasterization: shard the map-segment axis.

The reference has no sequence/context parallelism (SURVEY.md §5 "long
context" row); the genuinely analogous axis in this workload is the
map-segment axis of camera rasterization -- large maps mean many
projected segments per frame. Here each device projects, compacts, and
rasterizes its shard of the segment list into a partial mask and a
psum-OR over the `model` axis composes the final frame, trading an
(L,H,W) all-reduce for an E/D-sized per-device workload.

Two tiers:
  * `render_observation_batch_sp` / `rasterize_masks_packed_sp` -- the
    PRODUCTION path: the packed edge axis (map_compiler packed_* arrays)
    sharded through projection + compaction + the Pallas kernel
    (ops/rasterize_pallas), composable with DP over the `data` axis.
  * `rasterize_masks_sp` -- the dense-jnp variant on the padded per-layer
    axis, kept as a portable reference implementation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tinycarlo_tpu.ops import rasterize as ras
from tinycarlo_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _pad_axis(x: jnp.ndarray, axis: int, mult: int, value=0):
    """Pad `axis` up to a multiple of `mult` (shard_map needs even shards)."""
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def rasterize_masks_packed_sp(
    u0: jnp.ndarray,  # (B, E) packed edge axis, SoA pixel coords
    v0: jnp.ndarray,
    u1: jnp.ndarray,
    v1: jnp.ndarray,
    draw: jnp.ndarray,  # (B, E)
    edge_layer: jnp.ndarray,  # (E,) int32
    n_layers: int,
    resolution: Tuple[int, int],
    thickness: int,
    mesh: Mesh,
    max_visible: Optional[int] = None,
    data_sharded: bool = False,
    interpret: Optional[bool] = None,
    stroke: str = "fast",
) -> jnp.ndarray:
    """Production-kernel SP: each `model`-axis device compacts and
    rasterizes its shard of the packed segment axis through the Pallas
    kernel (ops/rasterize_pallas.rasterize_masks_packed_pallas_soa); a
    psum-OR composes the (B, L, H, W) masks. Bit-equal to the unsharded
    kernel whenever the `max_visible` budget is not oversubscribed (the
    budget applies PER SHARD, so sharding can only ever keep more).

    `data_sharded=True` additionally shards the batch axis over `data`
    (DP x SP). The segment axis is padded with dead slots to a multiple
    of the model-axis size. `stroke="exact"` routes the bit-exact cv2
    t>=2 stamp per shard -- the exact stroke is per-segment work and the
    psum-OR combine is stroke-agnostic, so SP-exact equals the unsharded
    exact path bit for bit (round-4 verdict item 3).
    """
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = mesh.shape[MODEL_AXIS]
    u0, v0, u1, v1 = (_pad_axis(x, 1, d) for x in (u0, v0, u1, v1))
    draw = _pad_axis(draw, 1, d, value=False)
    edge_layer = _pad_axis(edge_layer, 0, d)

    def shard_fn(u0s, v0s, u1s, v1s, draws, layer_s):
        part = rasterize_masks_packed_pallas_soa(
            u0s, v0s, u1s, v1s, draws, layer_s, n_layers, resolution,
            thickness, max_visible=max_visible, interpret=interpret,
            stroke=stroke,
        )
        hit = (part > 0).astype(jnp.int32)
        combined = jax.lax.psum(hit, MODEL_AXIS)
        return jnp.where(combined > 0, jnp.uint8(255), jnp.uint8(0))

    baxis = DATA_AXIS if data_sharded else None
    bspec = P(baxis, MODEL_AXIS)
    # check_vma=False: pallas_call does not declare varying-mesh-axes
    # metadata, so shard_map's vma checker cannot type it
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(bspec,) * 5 + (P(MODEL_AXIS),),
        out_specs=P(baxis),
        check_vma=False,
    )(u0, v0, u1, v1, draw, edge_layer)


def render_observation_batch_sp(
    params,
    states,
    mesh: Mesh,
    data_sharded: bool = False,
    interpret: Optional[bool] = None,
    out_dtype=jnp.uint8,
    fmt: str = "classes",
) -> jnp.ndarray:
    """`env.render_observation_batch` (classes format) with the packed
    segment axis sharded over the `model` mesh axis: each device projects
    its edge shard (node table + camera matrices replicated), compacts it,
    and runs the production Pallas kernel; a psum-OR composes the frame.
    This is the big-map path -- per-device projection/compaction work and
    segment memory scale with E/device. With `data_sharded=True` the env
    batch is simultaneously DP-sharded over `data`. A float `out_dtype`
    emits 0/1 masks for in-graph consumers (the fused TD3 chunk's
    float-obs encoder feed, train/td3_loop.chunk(obs_render_fn=...)),
    exactly like `env.render_observation_batch(out_dtype=...)`.
    `camera.stroke` is honored: "exact" routes the bit-exact cv2 t>=2
    Pallas stamp per shard (stroke is per-segment work; the psum-OR
    combine is stroke-agnostic), bit-equal to the unsharded exact
    renderer (tests/test_parallel.py::test_sp_exact_stroke_bit_equal).

    `fmt="rank"` emits the 1-byte/pixel paint-order layer map instead
    (env.observation_shape "rank" extension): each shard's rank kernel
    stamps max(layer+1) over ITS segments and a pmax over the model axis
    composes paint order globally (layer rank is shard-invariant, so
    SP-rank equals the unsharded rank map bit for bit). Under
    stroke="exact" with t>=2 the rank map derives from the psum-OR'd
    exact masks instead, mirroring env.render_observation_batch's
    fallback.
    """
    from tinycarlo_tpu import camera as cam
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
        rasterize_rank_packed_soa,
    )

    cfg = params.cfg
    md = params.map_data
    if fmt not in ("classes", "rank"):
        raise ValueError(f"unsupported SP observation format: {fmt!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = mesh.shape[MODEL_AXIS]
    edges = _pad_axis(md.packed_edges, 1, d)
    emask = _pad_axis(md.packed_edge_mask, 1, d, value=False)
    elayer = _pad_axis(md.packed_edge_layer, 0, d)
    rank_via_masks = cfg.camera.stroke == "exact" and cfg.camera.line_thickness >= 2

    def shard_fn(edges_s, emask_s, elayer_s, position, rotation):
        body = jax.vmap(cam.car_world_to_body_matrix)(position, rotation)
        pose = jnp.einsum("ij,bjk->bik", params.camera.E, body)
        u0, v0, u1, v1, draw = cam.project_layers_batch_soa(
            md.packed_nodes, edges_s, emask_s, pose, params.camera.K,
            cfg.camera.resolution, cfg.camera.max_range,
        )
        if fmt == "rank" and not rank_via_masks:
            part = rasterize_rank_packed_soa(
                u0[:, 0], v0[:, 0], u1[:, 0], v1[:, 0], draw[:, 0],
                elayer_s, md.n_layers, cfg.camera.resolution,
                cfg.camera.line_thickness,
                max_visible=cfg.camera.max_visible_segments,
                interpret=interpret,
            )
            return jax.lax.pmax(part, MODEL_AXIS)
        part = rasterize_masks_packed_pallas_soa(
            u0[:, 0], v0[:, 0], u1[:, 0], v1[:, 0], draw[:, 0], elayer_s,
            md.n_layers, cfg.camera.resolution, cfg.camera.line_thickness,
            max_visible=cfg.camera.max_visible_segments,
            interpret=interpret, stroke=cfg.camera.stroke,
        )
        hit = (part > 0).astype(jnp.int32)
        combined = jax.lax.psum(hit, MODEL_AXIS)
        if fmt == "rank":
            masks = jnp.where(combined > 0, jnp.uint8(255), jnp.uint8(0))
            return ras.rank_from_masks(masks)
        one = 255 if jnp.dtype(out_dtype) == jnp.uint8 else 1
        return jnp.where(combined > 0, one, 0).astype(out_dtype)

    baxis = DATA_AXIS if data_sharded else None
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(None, MODEL_AXIS, None),  # packed_edges (1, Ep, 2)
            P(None, MODEL_AXIS),        # packed_edge_mask (1, Ep)
            P(MODEL_AXIS),              # packed_edge_layer (Ep,)
            P(baxis, None),             # position (B, 2)
            P(baxis),                   # rotation (B,)
        ),
        out_specs=P(baxis),
        check_vma=False,
    )(edges, emask, elayer, states.car.position, states.car.rotation)


def rasterize_masks_sp(
    p0: jnp.ndarray,  # (L, E, 2) with E divisible by the model-axis size
    p1: jnp.ndarray,
    draw: jnp.ndarray,  # (L, E)
    resolution: Tuple[int, int],
    thickness: int,
    mesh: Mesh,
) -> jnp.ndarray:
    """Bit-equal to `rasterize_masks` but with the segment axis sharded
    over the `model` mesh axis and a psum-OR combine."""

    def shard_fn(p0_s, p1_s, draw_s):
        partial_mask = ras.rasterize_masks(
            p0_s, p1_s, draw_s, resolution, thickness
        )
        hit = (partial_mask > 0).astype(jnp.int32)
        combined = jax.lax.psum(hit, MODEL_AXIS)
        return jnp.where(combined > 0, jnp.uint8(255), jnp.uint8(0))

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(None, MODEL_AXIS, None),
            P(None, MODEL_AXIS, None),
            P(None, MODEL_AXIS),
        ),
        out_specs=P(),
    )(p0, p1, draw)
