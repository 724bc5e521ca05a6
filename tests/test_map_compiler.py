"""Map compiler tests: padding/masks/adjacency/spawn-table invariants, plus
cross-checks against the reference loader on the real simple_layout map.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import SIMPLE_LAYOUT_MAP, requires_reference
from tinycarlo_tpu.config import MapConfig
from tinycarlo_tpu.map_compiler import compile_map, compile_map_data

TINY_MAP = {
    "width": 100,
    "height": 50,
    "lanelines": {
        "outer": {
            "layer_color": [0, 0, 255],
            "nodes": [[0, 0], [10, 0], [10, 10]],
            "edges": [[0, 1], [1, 2]],
        },
        "dashed": {
            "layer_color": [0, 255, 0],
            "nodes": [[5, 5]],
            "edges": [[0, 0]],
        },
    },
    "lanepath": {
        "layer_color": [255, 255, 255],
        "nodes": [[0, 0], [10, 0], [20, 0], [30, 0]],
        "edges": [[0, 1], [1, 2], [2, 3]],
    },
}


def test_compile_tiny_map():
    md = compile_map_data(TINY_MAP, pixel_per_meter=10, dtype=jnp.float64)
    assert md.laneline_names == ("outer", "dashed")
    assert md.n_layers == 2
    # px -> m scaling (reference map.py:28-37)
    assert md.dimension.tolist() == [5.0, 10.0]
    assert md.laneline_nodes[0, 1].tolist() == [1.0, 0.0]
    # masks
    assert int(md.laneline_node_mask[0].sum()) == 3
    assert int(md.laneline_edge_mask[1].sum()) == 1
    # adjacency in edge order
    lp = md.lanepath
    assert int(lp.next_count[0]) == 1 and int(lp.next_table[0, 0]) == 1
    assert int(lp.prev_count[3]) == 1 and int(lp.prev_table[3, 0]) == 2
    assert int(lp.next_count[3]) == 0
    # spawn table: reference samples node indices 0..N-2 (exclusive high,
    # map.py:61) then rejects dead ends; node 3 has no successor anyway.
    assert md.spawns.count == 3
    assert md.spawns.node_idx[:3].tolist() == [0, 1, 2]
    assert md.spawns.rotation[0] == 0.0
    assert md.spawns.edge[1].tolist() == [1, 2]


def test_spawn_points_filtering():
    md = compile_map_data(
        TINY_MAP, pixel_per_meter=10, spawn_points=(2, 3), dtype=jnp.float64
    )
    # node 3 is a dead end -> filtered out
    assert md.spawns.count == 1
    assert md.spawns.node_idx[0] == 2


@requires_reference
def test_simple_layout_vs_reference(reference):
    from tinycarlo.map import Map

    cfg = {"json_path": SIMPLE_LAYOUT_MAP, "pixel_per_meter": 450}
    ref = Map(cfg, base_path=None)
    md = compile_map(
        MapConfig(json_path=SIMPLE_LAYOUT_MAP, pixel_per_meter=450),
        base_path=None,
        dtype=jnp.float64,
    )
    assert md.laneline_names == tuple(ref.get_laneline_names())
    for i, layer in enumerate(ref.lanelines):
        n = len(layer.nodes)
        np.testing.assert_array_equal(
            np.asarray(md.laneline_nodes[i][:n]), np.asarray(layer.nodes)
        )
        e = len(layer.edges)
        np.testing.assert_array_equal(
            np.asarray(md.laneline_edges[i][:e]), np.asarray(layer.edges)
        )
        assert md.laneline_colors[i].tolist() == list(layer.color)
    np.testing.assert_array_equal(
        np.asarray(md.lanepath.nodes[: md.lanepath.n_nodes]),
        np.asarray(ref.lanepath.nodes),
    )
    # adjacency equals the reference's linear scans, in the same order
    for node in range(0, md.lanepath.n_nodes, 7):
        nxt = [int(x) for x in md.lanepath.next_table[node] if x >= 0]
        assert nxt == ref.lanepath.get_next_nodes(node)
        prv = [int(x) for x in md.lanepath.prev_table[node] if x >= 0]
        assert prv == ref.lanepath.get_prev_nodes(node)
    # every spawn row reproduces reference sample_spawn for that node
    for r in range(0, md.spawns.count, 13):
        idx = int(md.spawns.node_idx[r])
        nxt = ref.lanepath.get_next_nodes(idx)
        assert nxt, "spawn table contains a dead-end node"
        pos = ref.lanepath.nodes[idx]
        np.testing.assert_array_equal(np.asarray(md.spawns.position[r]), pos)
        assert md.spawns.edge[r].tolist() == [idx, nxt[0]]
