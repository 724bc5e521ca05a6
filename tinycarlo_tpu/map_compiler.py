"""Map compiler: map JSON -> fixed-shape padded device arrays.

The reference's `Map`/`Layer` objects (reference: tinycarlo/map.py,
tinycarlo/layer.py) hold Python lists and answer queries with linear scans.
Here a map is *compiled once* on the host into padded jnp arrays plus
precomputed adjacency and spawn tables, so that every runtime query is a
fixed-shape masked tensor op. Padded sizes are rounded up to lane-friendly
multiples; changing maps recompiles (acceptable: maps are episode-static).
"""
from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tinycarlo_tpu.config import MapConfig

_PAD_MULTIPLE = 8


def _round_up(n: int, m: int = _PAD_MULTIPLE) -> int:
    return max(m, ((n + m - 1) // m) * m)


@struct.dataclass
class LayerArrays:
    """One polyline graph layer as padded arrays."""

    nodes: jnp.ndarray  # (Nmax, 2) float
    node_mask: jnp.ndarray  # (Nmax,) bool
    edges: jnp.ndarray  # (Emax, 2) int32
    edge_mask: jnp.ndarray  # (Emax,) bool
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_edges: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class LanePathArrays(LayerArrays):
    """The directed lanepath layer, with adjacency tables.

    ``next_table[n]`` lists successors of node n in original edge order
    (matching the reference's linear scan order, tinycarlo/layer.py:183),
    packed first and padded with -1; ``next_count[n]`` is the true degree.
    """

    next_table: jnp.ndarray = None  # (Nmax, D) int32
    next_count: jnp.ndarray = None  # (Nmax,) int32
    prev_table: jnp.ndarray = None  # (Nmax, D) int32
    prev_count: jnp.ndarray = None  # (Nmax,) int32


@struct.dataclass
class SpawnTable:
    """Precomputed valid spawn rows, replacing the reference's
    rejection-sampling recursion (tinycarlo/map.py:51-69). Rows are exactly
    the nodes the reference could return: candidates (spawn_points if given,
    else node indices 0..N-2 -- the reference's `integers(0, N-1)` has an
    exclusive high) filtered to nodes with at least one successor; the
    reference resamples uniformly until it hits one of these, which is the
    uniform distribution over this table.
    """

    node_idx: jnp.ndarray  # (S,) int32
    position: jnp.ndarray  # (S, 2) float
    rotation: jnp.ndarray  # (S,) float
    edge: jnp.ndarray  # (S, 2) int32
    count: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class LanelineGrid:
    """Uniform spatial grid over the packed laneline edges, pruning
    car_info's per-layer nearest-edge scans (reference scans every edge
    per query, tinycarlo/layer.py:33-44) to a per-cell candidate list.

    Exact-argmin-preserving: a cell's candidate list contains every edge
    e with lb(e) <= min_f ub(f), where lb/ub bound the reference's
    sum-of-endpoint-distances metric over the whole cell rectangle (lb =
    dist(rect, a) + dist(rect, b), ub = maxdist(rect, a) + maxdist(rect,
    b)). Any minimizer (and every tie) for any position inside the cell
    therefore survives, and candidates keep packed-edge order, so the
    first-wins argmin picks the identical edge. Positions outside the
    grid clamp to the boundary cell (approximate; see MapConfig).

    Candidate coordinates are inlined per cell ((C, K, 2) copies of the
    packed node coords) so the runtime query is one row gather + a K-
    wide reduction instead of an E-wide scan plus endpoint gathers.
    """

    origin: jnp.ndarray  # (2,) float (x, y) of cell (0, 0) corner
    inv_cell: jnp.ndarray  # () float, 1 / cell_size
    cand_idx: jnp.ndarray  # (C, K) int32 packed-edge index, -1 = pad
    cand_p0: jnp.ndarray  # (C, K, 2) float src endpoint coords
    cand_p1: jnp.ndarray  # (C, K, 2) float dst endpoint coords
    nx: int = struct.field(pytree_node=False, default=1)
    ny: int = struct.field(pytree_node=False, default=1)
    # Static per-layer offsets into the K axis (len L + 1): layer l's
    # candidates occupy [bounds[l], bounds[l+1]) of every row.
    layer_bounds: Tuple[int, ...] = struct.field(
        pytree_node=False, default=()
    )


def _build_laneline_grid(
    packed_nodes: np.ndarray,  # (Np, 2) float (post-dtype cast)
    packed_edges: np.ndarray,  # (Ep, 2) int32
    n_real_edges: int,
    layer_bounds: Tuple[int, ...],
    dimension_hw: Tuple[float, float],
    target_cells: int,
    margin: Optional[float],
) -> Optional[LanelineGrid]:
    """Host-side grid construction (see LanelineGrid). Returns None when
    pruning would not pay (candidate rows nearly as wide as the edge
    axis)."""
    if n_real_edges == 0:
        return None
    h_m, w_m = float(dimension_hw[0]), float(dimension_hw[1])
    if margin is None:
        margin = 0.5 * max(h_m, w_m)
    x0, y0 = -margin, -margin
    x1, y1 = w_m + margin, h_m + margin
    area = max((x1 - x0) * (y1 - y0), 1e-9)
    cell = math.sqrt(area / max(target_cells, 1))
    nx = max(1, int(math.ceil((x1 - x0) / cell)))
    ny = max(1, int(math.ceil((y1 - y0) / cell)))

    # Cell rectangles (C, 1, 2) against edge endpoints (1, E, 2).
    cxs = x0 + cell * np.arange(nx)
    cys = y0 + cell * np.arange(ny)
    lo = np.stack(
        [np.tile(cxs, ny), np.repeat(cys, nx)], axis=-1
    )  # (C, 2) cell min corner, row-major cell = cy * nx + cx
    hi = lo + cell
    a = packed_nodes[packed_edges[:n_real_edges, 0]].astype(np.float64)
    b = packed_nodes[packed_edges[:n_real_edges, 1]].astype(np.float64)

    def rect_dists(p):  # (E, 2) -> (C, E) min & max distance to rect
        clamped = np.clip(p[None], lo[:, None], hi[:, None])
        dmin = np.linalg.norm(clamped - p[None], axis=-1)
        far = np.maximum(
            np.abs(p[None] - lo[:, None]), np.abs(p[None] - hi[:, None])
        )
        dmax = np.linalg.norm(far, axis=-1)
        return dmin, dmax

    a_min, a_max = rect_dists(a)
    b_min, b_max = rect_dists(b)
    lb = a_min + b_min  # (C, E)
    ub = a_max + b_max

    n_layers = len(layer_bounds) - 1
    keep = np.zeros_like(lb, dtype=bool)
    for l in range(n_layers):
        s, e = layer_bounds[l], layer_bounds[l + 1]
        if e <= s:
            continue
        thresh = ub[:, s:e].min(axis=1, keepdims=True)
        keep[:, s:e] = lb[:, s:e] <= thresh
    per_layer_k = [
        int(keep[:, layer_bounds[l]: layer_bounds[l + 1]].sum(axis=1).max())
        if layer_bounds[l + 1] > layer_bounds[l]
        else 0
        for l in range(n_layers)
    ]
    k_tot = sum(per_layer_k)
    if k_tot >= 0.9 * n_real_edges:
        return None  # pruning would not pay on this map

    ncells = nx * ny
    cand_idx = np.full((ncells, k_tot), -1, dtype=np.int32)
    out_bounds = tuple(np.cumsum([0] + per_layer_k).tolist())
    for l in range(n_layers):
        s, e = layer_bounds[l], layer_bounds[l + 1]
        o = out_bounds[l]
        for c in range(ncells):
            (idx,) = np.nonzero(keep[c, s:e])
            cand_idx[c, o: o + len(idx)] = idx + s
    safe = np.maximum(cand_idx, 0)
    cand_p0 = packed_nodes[packed_edges[safe, 0]]
    cand_p1 = packed_nodes[packed_edges[safe, 1]]
    return LanelineGrid(
        origin=np.asarray([x0, y0], dtype=packed_nodes.dtype),
        inv_cell=np.asarray(1.0 / cell, dtype=packed_nodes.dtype),
        cand_idx=cand_idx,
        cand_p0=cand_p0,
        cand_p1=cand_p1,
        nx=nx,
        ny=ny,
        layer_bounds=out_bounds,
    )


@struct.dataclass
class MapData:
    """A compiled map. Laneline layers are stacked along a leading axis,
    all padded to the same Nmax/Emax so camera projection vmaps over them.
    """

    laneline_nodes: jnp.ndarray  # (L, Nmax, 2)
    laneline_node_mask: jnp.ndarray  # (L, Nmax)
    laneline_edges: jnp.ndarray  # (L, Emax, 2) int32
    laneline_edge_mask: jnp.ndarray  # (L, Emax)
    laneline_colors: jnp.ndarray  # (L, 3) int32 (RGB, reference layer_color)
    lanepath: LanePathArrays
    spawns: SpawnTable
    dimension: jnp.ndarray  # (2,) float: (height, width) meters
    # Packed (ragged-free) view of the laneline layers for the camera
    # pipeline: every layer's REAL nodes/edges concatenated, so projection
    # and segment compaction scan sum(E_l) slots instead of L * max(E_l).
    # On reference maps the per-layer edge counts are highly skewed
    # (simple_layout: 192+65+3+3+1 = 264 real edges vs 5*192 = 960 padded
    # slots), making the packed axis ~3x cheaper. Shapes carry a leading
    # pseudo-layer axis of 1 so `camera.project_layers_batch` can be
    # reused unchanged.
    packed_nodes: jnp.ndarray = None  # (1, Np, 2)
    packed_edges: jnp.ndarray = None  # (1, Ep, 2) int32 into packed nodes
    packed_edge_mask: jnp.ndarray = None  # (1, Ep) bool
    packed_edge_layer: jnp.ndarray = None  # (Ep,) int32 layer id per edge
    # Static cumulative per-layer edge offsets into the packed axis
    # (len L + 1; layer l's real edges live at [bounds[l], bounds[l+1])).
    # Being compile-time constants, per-layer reductions over the packed
    # axis can use static slices instead of materializing (B, L, Ep)
    # one-hot masks (see compact_env_idx_soa counts, car_info).
    packed_layer_bounds: Tuple[int, ...] = struct.field(
        pytree_node=False, default=()
    )
    # Spatial-pruning grid for car_info's nearest-edge queries (see
    # LanelineGrid); None = full scan (reference behavior everywhere).
    laneline_grid: Optional[LanelineGrid] = None
    laneline_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    pixel_per_meter: int = struct.field(pytree_node=False, default=1)

    @property
    def n_layers(self) -> int:
        return len(self.laneline_names)


def _compile_layer(
    layer: Dict[str, Any], n_max: int, e_max: int, dtype
) -> LayerArrays:
    nodes = np.asarray(layer["nodes"], dtype=np.float64).reshape(-1, 2)
    edges = np.asarray(layer["edges"], dtype=np.int32).reshape(-1, 2)
    n, e = len(nodes), len(edges)
    pad_nodes = np.zeros((n_max, 2), dtype=np.float64)
    pad_nodes[:n] = nodes
    # Padded node slots repeat node 0 so stray gathers stay in-bounds & finite.
    if n:
        pad_nodes[n:] = nodes[0]
    pad_edges = np.zeros((e_max, 2), dtype=np.int32)
    pad_edges[:e] = edges
    node_mask = np.arange(n_max) < n
    edge_mask = np.arange(e_max) < e
    # Host numpy throughout; the whole MapData is device_put once at the
    # end of compile_map_data (eager per-leaf transfers each pay a dispatch
    # round-trip, which is expensive on tunneled TPU backends).
    return LayerArrays(
        nodes=np.asarray(pad_nodes, dtype=dtype),
        node_mask=node_mask,
        edges=pad_edges,
        edge_mask=edge_mask,
        n_nodes=n,
        n_edges=e,
    )


def _adjacency(edges: np.ndarray, n_nodes: int, n_max: int):
    """Successor/predecessor tables in original edge order."""
    next_lists = [[] for _ in range(n_max)]
    prev_lists = [[] for _ in range(n_max)]
    for src, dst in edges:
        next_lists[src].append(int(dst))
        prev_lists[dst].append(int(src))
    deg = max(
        [1]
        + [len(x) for x in next_lists]
        + [len(x) for x in prev_lists]
    )
    deg = max(2, deg)
    next_table = np.full((n_max, deg), -1, dtype=np.int32)
    prev_table = np.full((n_max, deg), -1, dtype=np.int32)
    next_count = np.zeros(n_max, dtype=np.int32)
    prev_count = np.zeros(n_max, dtype=np.int32)
    for i in range(n_max):
        next_table[i, : len(next_lists[i])] = next_lists[i]
        next_count[i] = len(next_lists[i])
        prev_table[i, : len(prev_lists[i])] = prev_lists[i]
        prev_count[i] = len(prev_lists[i])
    return next_table, next_count, prev_table, prev_count


def compile_map(
    map_config: MapConfig,
    base_path: Optional[str] = None,
    dtype=jnp.float32,
) -> MapData:
    """Load a reference map.json, scale px -> meters (reference:
    tinycarlo/map.py:28-37), and pack everything into a MapData pytree.
    """
    base_dir = "./" if base_path is None else os.path.dirname(base_path)
    map_path = os.path.join(base_dir, map_config.json_path)
    with open(map_path) as f:
        raw = json.load(f)
    return compile_map_data(raw, map_config.pixel_per_meter,
                            spawn_points=map_config.spawn_points, dtype=dtype,
                            query_grid=map_config.query_grid,
                            query_grid_cells=map_config.query_grid_cells,
                            query_grid_margin=map_config.query_grid_margin)


def compile_map_data(
    raw: Dict[str, Any],
    pixel_per_meter: float,
    spawn_points: Optional[Tuple[int, ...]] = None,
    dtype=jnp.float32,
    query_grid: bool = True,
    query_grid_cells: int = 4096,
    query_grid_margin: Optional[float] = None,
) -> MapData:
    ppm = float(pixel_per_meter)
    height = raw["height"] / ppm
    width = raw["width"] / ppm

    lanelines = raw["lanelines"]
    names = tuple(lanelines.keys())
    scaled_layers = {}
    for name, layer in lanelines.items():
        scaled_layers[name] = {
            "nodes": (np.asarray(layer["nodes"], dtype=np.float64) / ppm),
            "edges": layer["edges"],
            "layer_color": layer["layer_color"],
        }
    lp_nodes = np.asarray(raw["lanepath"]["nodes"], dtype=np.float64) / ppm
    lp_edges = np.asarray(raw["lanepath"]["edges"], dtype=np.int32).reshape(-1, 2)

    n_max = _round_up(max(len(l["nodes"]) for l in scaled_layers.values()))
    e_max = _round_up(max(len(l["edges"]) for l in scaled_layers.values()))
    layer_arrays = [
        _compile_layer(scaled_layers[name], n_max, e_max, dtype) for name in names
    ]
    colors = np.asarray(
        [scaled_layers[name]["layer_color"] for name in names], dtype=np.int32
    )

    # Lanepath with adjacency.
    lp_nmax = _round_up(len(lp_nodes))
    lp_emax = _round_up(len(lp_edges))
    lp = _compile_layer(
        {"nodes": lp_nodes, "edges": lp_edges}, lp_nmax, lp_emax, dtype
    )
    nt, nc, pt, pc = _adjacency(lp_edges, len(lp_nodes), lp_nmax)
    lanepath = LanePathArrays(
        nodes=lp.nodes,
        node_mask=lp.node_mask,
        edges=lp.edges,
        edge_mask=lp.edge_mask,
        n_nodes=lp.n_nodes,
        n_edges=lp.n_edges,
        next_table=nt,
        next_count=nc,
        prev_table=pt,
        prev_count=pc,
    )

    # Spawn table: candidates with >= 1 successor, first successor defines
    # the spawn edge + rotation (reference: tinycarlo/map.py:61-68).
    if spawn_points is not None:
        candidates = [int(s) for s in spawn_points]
    else:
        candidates = list(range(max(0, len(lp_nodes) - 1)))
    rows = []
    for idx in candidates:
        succs = nt[idx]
        succs = succs[succs >= 0]
        if len(succs) == 0:
            continue
        nxt = int(succs[0])
        pos = lp_nodes[idx]
        npos = lp_nodes[nxt]
        rot = math.atan2(npos[1] - pos[1], npos[0] - pos[0])
        rows.append((idx, pos[0], pos[1], rot, idx, nxt))
    if not rows:
        raise ValueError("map has no valid spawn node (no node with successor)")
    s = len(rows)
    s_max = _round_up(s)
    arr = np.zeros((s_max, 6), dtype=np.float64)
    arr[:s] = np.asarray(rows, dtype=np.float64)
    arr[s:] = arr[0]  # pad with the first row; sampling never selects pads
    spawns = SpawnTable(
        node_idx=np.asarray(arr[:, 0], dtype=np.int32),
        position=np.asarray(arr[:, 1:3], dtype=dtype),
        rotation=np.asarray(arr[:, 3], dtype=dtype),
        edge=np.asarray(arr[:, 4:6], dtype=np.int32),
        count=s,
    )

    # Packed camera view: real (unpadded) nodes/edges of all layers
    # concatenated, edges re-indexed into the packed node table.
    pk_nodes, pk_edges, pk_lay, node_off = [], [], [], 0
    for li, l in enumerate(layer_arrays):
        pk_nodes.append(l.nodes[: l.n_nodes])
        pk_edges.append(l.edges[: l.n_edges] + node_off)
        pk_lay.append(np.full(l.n_edges, li, dtype=np.int32))
        node_off += l.n_nodes
    pk_nodes = np.concatenate(pk_nodes) if pk_nodes else np.zeros((0, 2), dtype)
    pk_edges = (
        np.concatenate(pk_edges) if pk_edges else np.zeros((0, 2), np.int32)
    )
    pk_lay = np.concatenate(pk_lay) if pk_lay else np.zeros((0,), np.int32)
    np_, ep = _round_up(len(pk_nodes)), _round_up(len(pk_edges))
    packed_nodes = np.zeros((np_, 2), dtype=pk_nodes.dtype)
    packed_nodes[: len(pk_nodes)] = pk_nodes
    if len(pk_nodes):
        packed_nodes[len(pk_nodes):] = pk_nodes[0]
    packed_edges = np.zeros((ep, 2), np.int32)
    packed_edges[: len(pk_edges)] = pk_edges
    packed_edge_mask = np.arange(ep) < len(pk_edges)
    packed_edge_layer = np.zeros((ep,), np.int32)
    packed_edge_layer[: len(pk_lay)] = pk_lay

    packed_bounds = tuple(
        np.cumsum([0] + [l.n_edges for l in layer_arrays]).tolist()
    )
    grid = None
    if query_grid:
        grid = _build_laneline_grid(
            np.asarray(packed_nodes, dtype=np.dtype(dtype)),
            packed_edges,
            int(len(pk_edges)),
            packed_bounds,
            (height, width),
            query_grid_cells,
            query_grid_margin,
        )

    map_data = MapData(
        laneline_nodes=np.stack([l.nodes for l in layer_arrays]),
        laneline_node_mask=np.stack([l.node_mask for l in layer_arrays]),
        laneline_edges=np.stack([l.edges for l in layer_arrays]),
        laneline_edge_mask=np.stack([l.edge_mask for l in layer_arrays]),
        packed_nodes=packed_nodes[None].astype(dtype),
        packed_edges=packed_edges[None],
        packed_edge_mask=packed_edge_mask[None],
        packed_edge_layer=packed_edge_layer,
        packed_layer_bounds=packed_bounds,
        laneline_grid=grid,
        laneline_colors=colors,
        lanepath=lanepath,
        spawns=spawns,
        dimension=np.asarray([height, width], dtype=dtype),
        laneline_names=names,
        pixel_per_meter=int(pixel_per_meter),
    )
    # One transfer for the whole pytree (no per-leaf eager dispatches).
    return jax.device_put(map_data)
