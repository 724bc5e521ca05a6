"""Segment-parallel (SP) rasterization: shard the map-segment axis.

The reference has no sequence/context parallelism (SURVEY.md §5 "long
context" row); the genuinely analogous axis in this workload is the
map-segment axis of camera rasterization -- large maps mean many
projected segments per frame. Here each device rasterizes its shard of
the segment list into a partial mask and a psum-OR over the `model` axis
composes the final frame, trading an (L,H,W) all-reduce for an S/D-sized
per-device workload.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tinycarlo_tpu.ops import rasterize as ras
from tinycarlo_tpu.parallel.mesh import MODEL_AXIS


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
