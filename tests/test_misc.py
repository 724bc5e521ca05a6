"""Mapgen, mapbuilder, and logging-utility tests."""
import json
import os

import numpy as np
import pytest


def test_mapgen_schema_roundtrip(tmp_path):
    from tinycarlo_tpu.map_compiler import compile_map_data
    from tinycarlo_tpu.mapgen import figure_eight, loop_track, save_map

    for gen in (loop_track, figure_eight):
        m = gen()
        assert set(m) == {"width", "height", "lanelines", "lanepath"}
        for layer in m["lanelines"].values():
            assert set(layer) == {"layer_color", "nodes", "edges"}
        p = tmp_path / "m.json"
        save_map(m, str(p))
        md = compile_map_data(json.load(open(p)), 450)
        assert md.spawns.count > 0
        # every lanepath node except dead-ends is spawnable; loops have none
        assert md.lanepath.n_edges > 0


def test_layer_builder_ops():
    from tinycarlo_tpu.mapbuilder.layer_builder import LayerBuilder

    bg = np.zeros((100, 100, 3), np.uint8)
    lb = LayerBuilder("outer", (255, 0, 0), False, bg)
    lb.add_node(10, 10)
    lb.add_node(50, 10)
    lb.add_node(50, 50)
    assert len(lb.nodes) == 3 and len(lb.edges) == 2
    # loop closure back to node 0 (click within threshold)
    near = lb.nearest_node(12, 11)
    assert near == 0
    lb.close_loop(near)
    assert len(lb.edges) == 3
    # undo removes the closure edge
    lb.undo()
    assert len(lb.edges) == 2
    # drag a node, then undo restores it
    lb.select(50, 50)
    lb.move_selected(60, 60)
    assert lb.nodes[2] == (60, 60)
    lb.undo()
    assert lb.nodes[2] == (50, 50)
    name, d = lb.to_dict()
    assert name == "outer" and len(d["nodes"]) == 3
    img = lb.render()
    assert img.shape == bg.shape and img.sum() > 0


def test_logging_utils(tmp_path):
    from tinycarlo_tpu.train import logging as tlog

    assert tlog.avg_w([1.0, 2.0], 5) == float("inf")
    assert tlog.avg_w([1.0] * 10, 5) == 1.0
    assert tlog.ma([1, 2, 3, 4], 2) == [1.5, 2.5]

    out = str(tmp_path)
    tlog.save_losses(out, [1.0, 2.0], [1.5, 2.5], [0.1], suffix="test")
    tlog.save_rewards(out, [5.0, 6.0])
    tlog.save_series(out, "cte", [0.01, 0.02])
    assert os.path.exists(os.path.join(out, "critic_loss_test.csv"))
    assert os.path.exists(os.path.join(out, "rew.csv"))

    hist = {}
    tlog.snapshot_params({"layer": {"kernel": np.ones((2, 2))}}, 0, hist)
    tlog.snapshot_params({"layer": {"kernel": np.full((2, 2), 1.5)}}, 200, hist)
    changes = tlog.weight_changes(hist)
    (key, vals), = changes.items()
    assert vals == [0.5]

    tlog.plot_series(os.path.join(out, "p.png"), {"a": [1, 2, 3]})
    assert os.path.exists(os.path.join(out, "p.png"))


def test_save_weight_changes_schema(tmp_path):
    """Long-format weight-change CSV matches the reference dashboard's
    schema (pages/layout_utils.py:63-69)."""
    import csv

    from tinycarlo_tpu.train import logging as tlog

    changes = {"fc1/kernel": [0.1, 0.2], "Conv_0/kernel": [0.3, 0.4]}
    tlog.save_weight_changes(str(tmp_path), "actor", changes,
                             step_interval=200, suffix="with_shift")
    path = tmp_path / "actor_weight_changes_with_shift.csv"
    rows = list(csv.reader(open(path)))
    assert rows[0] == ["Step", "Layer", "Mean Absolute Weight Change"]
    assert rows[1] == ["200", "Conv_0/kernel", "0.3"]
    assert rows[2] == ["200", "fc1/kernel", "0.1"]
    assert rows[3] == ["400", "Conv_0/kernel", "0.4"]
    assert len(rows) == 5


def test_weight_changes_snapshot_roundtrip():
    import numpy as np

    from tinycarlo_tpu.train import logging as tlog

    hist = {}
    p0 = {"a": {"kernel": np.zeros((2, 2))}}
    p1 = {"a": {"kernel": np.full((2, 2), 0.5)}}
    tlog.snapshot_params(p0, 0, hist)
    tlog.snapshot_params(p1, 200, hist)
    out = tlog.weight_changes(hist)
    assert out == {"a/kernel": [0.5]}


def test_slow_table_no_dup_keys():
    """tests/conftest.py's _SLOW_TESTS is a dict literal: a duplicate
    file key silently REPLACES the earlier entry's test set (this once
    unmarked the exact-stroke kernel tests). Parse the source and assert
    every file key appears exactly once."""
    import ast
    import os

    path = os.path.join(os.path.dirname(__file__), "conftest.py")
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "_SLOW_TESTS" for t in node.targets
        ):
            keys = [k.value for k in node.value.keys]
            assert len(keys) == len(set(keys)), (
                f"duplicate _SLOW_TESTS keys: "
                f"{sorted(k for k in keys if keys.count(k) > 1)}"
            )
            break
    else:
        raise AssertionError("_SLOW_TESTS not found in conftest.py")
