"""Geometry truth tables, ported from the reference's unit tests
(reference: test/test_layer.py, test/test_helper.py) -- these encode the
sign conventions and first-wins tie-breaking the simulator depends on --
plus coverage the reference left as empty stubs (nearest_connected_edge,
pick_node_given_orientation).
"""
import math

import jax.numpy as jnp
import pytest

from tests.util import adjacency, make_layer
from tinycarlo_tpu import geometry as geo
from tinycarlo_tpu.utils.helper import angle, clip_angle


def length(v):
    return math.sqrt(v[0] ** 2 + v[1] ** 2)


def test_clip_angle():
    # reference test/test_helper.py:6-15
    assert clip_angle(0.0) == 0
    assert clip_angle(math.pi) == math.pi
    assert clip_angle(-math.pi) == -math.pi
    assert clip_angle(2 * math.pi) == 0
    assert clip_angle(-2 * math.pi) == 0
    assert clip_angle(3 * math.pi) == math.pi
    assert clip_angle(-3 * math.pi) == -math.pi
    assert clip_angle(-3 / 2 * math.pi) == math.pi / 2
    assert clip_angle(3 / 2 * math.pi) == -math.pi / 2
    # batched
    out = clip_angle(jnp.asarray([0.0, 2 * math.pi, -3 * math.pi]))
    assert out.tolist() == [0.0, 0.0, -math.pi]


def test_angle():
    assert angle(1.0, 0.0) == 0
    assert float(angle(0.0, 1.0)) == pytest.approx(math.pi / 2)


def nearest_edge(layer, pos):
    nodes, _, edges, emask = layer
    idx = geo.nearest_edge_idx(nodes, edges, emask, jnp.asarray(pos, jnp.float64))
    return tuple(edges[idx].tolist())


def test_nearest_edge():
    # reference test/test_layer.py:32-65
    e = [(0, 1), (2, 3)]
    layer = make_layer([(0, 0), (4, 0), (0, 4), (4, 4)], e)
    assert nearest_edge(layer, (0, 1)) == e[0]
    assert nearest_edge(layer, (4, 1)) == e[0]
    assert nearest_edge(layer, (1, 0)) == e[0]
    assert nearest_edge(layer, (1, 4)) == e[1]
    assert nearest_edge(layer, (1, 5)) == e[1]
    assert nearest_edge(layer, (0, -1)) == e[0]
    assert nearest_edge(layer, (-1, 0)) == e[0]
    assert nearest_edge(layer, (-1, -1)) == e[0]
    assert nearest_edge(layer, (-1, 5)) == e[1]
    assert nearest_edge(layer, (0, 2.01)) == e[1]
    assert nearest_edge(layer, (0, 1.99)) == e[0]
    assert nearest_edge(layer, (2, 2.01)) == e[1]
    assert nearest_edge(layer, (2, 1.99)) == e[0]
    assert nearest_edge(layer, (2, 2)) == e[0]  # tie -> first in list
    e = [(0, 1), (1, 2)]
    layer = make_layer([(0, 0), (3, 0), (3, 3)], e)
    assert nearest_edge(layer, (0, 3)) == e[0]  # tie
    assert nearest_edge(layer, (1, 1)) == e[0]
    assert nearest_edge(layer, (1, 2)) == e[0]
    assert nearest_edge(layer, (1, 3)) == e[1]
    assert nearest_edge(layer, (1, 4)) == e[1]
    assert nearest_edge(layer, (2, 1)) == e[0]  # tie
    assert nearest_edge(layer, (2, 2)) == e[1]
    assert nearest_edge(layer, (4, 0)) == e[1]
    assert nearest_edge(layer, (3, -1)) == e[0]


def test_nearest_node():
    # reference test/test_layer.py:67-88
    nodes, nmask, _, _ = make_layer([(0, 0), (4, 0), (0, 4), (4, 4)], [])

    def nn(pos):
        return int(geo.nearest_node_idx(nodes, nmask, jnp.asarray(pos, jnp.float64)))

    assert nn((0, 1)) == 0
    assert nn((4, 1)) == 1
    assert nn((1, 0)) == 0
    assert nn((1, 4)) == 2
    assert nn((1, 5)) == 2
    assert nn((0, -1)) == 0
    assert nn((-1, 0)) == 0
    assert nn((-1, -1)) == 0
    assert nn((-1, 5)) == 2
    assert nn((0, 2.01)) == 2
    assert nn((0, 1.99)) == 0
    assert nn((2.1, 2.1)) == 3
    assert nn((2.1, 1.99)) == 1
    assert nn((1.99, 1.99)) == 0
    assert nn((1.99, 2.1)) == 2
    assert nn((2, 2)) == 0  # tie -> first


def oriented(layer, pos, ori, margin=30.0):
    nodes, _, edges, emask = layer
    idx = geo.nearest_edge_with_orientation_idx(
        nodes, edges, emask, jnp.asarray(pos, jnp.float64), jnp.asarray(ori), margin
    )
    return None if int(idx) < 0 else tuple(edges[idx].tolist())


def test_nearest_edge_with_orientation():
    # reference test/test_layer.py:90-113
    e = [(0, 1), (1, 0)]
    layer = make_layer([(0, 0), (3, 0)], e)
    assert oriented(layer, (0, 0), 0.0) == e[0]
    assert oriented(layer, (0, 0), math.pi) == e[1]
    assert oriented(layer, (0, 0), -math.pi) == e[1]
    assert oriented(layer, (0, 0), math.radians(29)) == e[0]
    assert oriented(layer, (0, 0), math.radians(-29)) == e[0]
    assert oriented(layer, (0, 0), math.radians(180 - 29)) == e[1]
    assert oriented(layer, (0, 0), math.radians(-180 + 29)) == e[1]
    e = [(0, 1), (1, 2)]
    layer = make_layer([(0, 0), (3, 0), (3, 3)], e)
    assert oriented(layer, (0, 3), 0.0) == e[0]
    assert oriented(layer, (3, 3), 0.0) == e[0]
    assert oriented(layer, (3, 3), math.radians(30)) == e[0]
    assert oriented(layer, (3, 3), math.radians(45)) is None
    assert oriented(layer, (3, 3), math.radians(60.01)) == e[1]
    assert oriented(layer, (0, 0), math.radians(90)) == e[1]
    assert oriented(layer, (0, 0), math.pi) is None
    assert oriented(layer, (0, 0), -math.pi) is None


def within(layer, pos, edge):
    nodes, _, edges, _ = layer
    return bool(
        geo.within_edge_bounds(nodes, edges[edge], jnp.asarray(pos, jnp.float64))
    )


def test_within_edge_bounds():
    # reference test/test_layer.py:121-165
    layer = make_layer([(0, 0), (3, 0)], [(0, 1)])
    assert within(layer, (0, 5), 0) is True
    assert within(layer, (-1, 5), 0) is False
    assert within(layer, (3.1, 5), 0) is False
    assert within(layer, (3, 5), 0) is True
    assert within(layer, (1, -5), 0) is True
    assert within(layer, (1, 0), 0) is True
    assert within(layer, (1, 0.1), 0) is True
    assert within(layer, (0, 0), 0) is True
    assert within(layer, (3, 0), 0) is True
    assert within(layer, (3.001, 0), 0) is False
    layer = make_layer([(0, 0), (3, 0)], [(1, 0)])
    assert within(layer, (0, 5), 0) is True
    assert within(layer, (-1, 5), 0) is False
    assert within(layer, (3.1, 5), 0) is False
    assert within(layer, (3, 5), 0) is True
    assert within(layer, (1, -5), 0) is True
    assert within(layer, (1, 0), 0) is True
    assert within(layer, (1, 0.1), 0) is True
    layer = make_layer([(0, 0), (0, 3)], [(0, 1)])
    assert within(layer, (5, 0), 0) is True
    assert within(layer, (5, 1), 0) is True
    assert within(layer, (5, 3), 0) is True
    assert within(layer, (5, 4), 0) is False
    assert within(layer, (-5, 0), 0) is True
    assert within(layer, (-5, 1), 0) is True
    assert within(layer, (-5, -0.1), 0) is False
    assert within(layer, (0, 0), 0) is True
    assert within(layer, (0, 3), 0) is True
    layer = make_layer([(0, 0), (3, 3)], [(0, 1)])
    assert within(layer, (0, 3), 0) is True
    assert within(layer, (3, 0), 0) is True
    assert within(layer, (3, 3), 0) is True
    assert within(layer, (0, 0), 0) is True
    assert within(layer, (1, 1), 0) is True
    assert within(layer, (-1, -1), 0) is False
    assert within(layer, (4, 4), 0) is False


def sdist(layer, pos, edge):
    nodes, _, edges, _ = layer
    return float(
        geo.signed_distance_to_edge(nodes, edges[edge], jnp.asarray(pos, jnp.float64))
    )


def test_distance_to_edge():
    # reference test/test_layer.py:170-201
    layer = make_layer([(0, 0), (3, 0)], [(0, 1)])
    assert sdist(layer, (0, 0), 0) == 0
    assert sdist(layer, (2, 1), 0) == -1
    assert sdist(layer, (5, 2), 0) == -2
    assert sdist(layer, (5, -2), 0) == 2
    assert sdist(layer, (-5, -2), 0) == 2
    layer = make_layer([(0, 0), (3, 0)], [(1, 0)])
    assert sdist(layer, (0, 0), 0) == 0
    assert sdist(layer, (2, 1), 0) == 1
    assert sdist(layer, (5, 2), 0) == 2
    assert sdist(layer, (5, -2), 0) == -2
    assert sdist(layer, (-5, -2), 0) == -2
    layer = make_layer([(0, 0), (0, 3)], [(0, 1)])
    assert sdist(layer, (0, 0), 0) == 0
    assert sdist(layer, (1, 2), 0) == 1
    assert sdist(layer, (2, 5), 0) == 2
    assert sdist(layer, (-2, 5), 0) == -2
    assert sdist(layer, (-2, -5), 0) == -2
    layer = make_layer([(0, 0), (0, 3)], [(1, 0)])
    assert sdist(layer, (0, 0), 0) == 0
    assert sdist(layer, (1, 2), 0) == -1
    assert sdist(layer, (2, 5), 0) == -2
    assert sdist(layer, (-2, 5), 0) == 2
    assert sdist(layer, (-2, -5), 0) == 2


def test_distance_to_edge_at_angle():
    # reference test/test_layer.py:203-220
    half_diag = length((3, 3)) / 2
    layer = make_layer([(0, 0), (3, 3)], [(0, 1)])
    assert sdist(layer, (0, 3), 0) == pytest.approx(-half_diag)
    assert sdist(layer, (3, 0), 0) == pytest.approx(half_diag)
    layer = make_layer([(0, 0), (3, 3)], [(1, 0)])
    assert sdist(layer, (0, 3), 0) == pytest.approx(half_diag)
    assert sdist(layer, (3, 0), 0) == pytest.approx(-half_diag)
    layer = make_layer([(0, 3), (3, 0)], [(0, 1)])
    assert sdist(layer, (0, 0), 0) == pytest.approx(half_diag)
    assert sdist(layer, (3, 3), 0) == pytest.approx(-half_diag)
    layer = make_layer([(0, 3), (3, 0)], [(1, 0)])
    assert sdist(layer, (0, 0), 0) == pytest.approx(-half_diag)
    assert sdist(layer, (3, 3), 0) == pytest.approx(half_diag)


def test_pick_node_given_orientation():
    # fills the reference's empty stub (test/test_layer.py:118)
    nodes, _, _, _ = make_layer([(0, 0), (1, 0), (0, 1), (-1, 0)], [])
    cand = jnp.asarray([1, 2, 3, -1], jnp.int32)

    def pick(ori, count):
        return int(
            geo.pick_node_given_orientation(
                nodes, jnp.asarray(0), jnp.asarray(ori, jnp.float64), cand,
                jnp.asarray(count),
            )
        )

    assert pick(0.0, 3) == 1  # east
    assert pick(math.pi / 2, 3) == 2  # north
    assert pick(math.pi, 3) == 3  # west
    assert pick(math.pi / 4, 3) == 1  # tie east/north -> first
    # single candidate returned regardless of orientation
    assert pick(math.pi, 1) == 1
    # no candidates -> -1 (reference None)
    assert pick(0.0, 0) == -1


def test_nearest_connected_edge():
    # fills the reference's empty stub (test/test_layer.py:115-116):
    # chain 0 -> 1 -> 2 -> 3 along x.
    nodes, _, edges, _ = make_layer(
        [(0, 0), (1, 0), (2, 0), (3, 0)], [(0, 1), (1, 2), (2, 3)]
    )
    nt, nc, pt, pc = adjacency([(0, 1), (1, 2), (2, 3)], 4)

    def walk(pos, edge):
        e, valid = geo.nearest_connected_edge(
            nodes,
            jnp.asarray(pos, jnp.float64),
            jnp.asarray(edge, jnp.int32),
            jnp.asarray(0.0, jnp.float64),
            nt, nc, pt, pc,
        )
        return tuple(e.tolist()), bool(valid)

    # position near the middle of current edge -> stay
    assert walk((1.5, 0), (1, 2)) == ((1, 2), True)
    # position near the successor -> step forward
    assert walk((2.9, 0), (1, 2)) == ((2, 3), True)
    # position near the predecessor -> step backward
    assert walk((0.1, 0), (1, 2)) == ((0, 1), True)
    # dead end ahead: edge (2,3) has no successor -> invalid (reference None)
    _, valid = walk((3.0, 0), (2, 3))
    assert valid is False


def test_take_rows_onehot_exact(monkeypatch):
    """The one-hot-matmul lowering of take_rows (the TPU path) is
    value-exact vs the native gather for float and integer tables."""
    import numpy as _np

    from tinycarlo_tpu import geometry as geo

    rng = _np.random.default_rng(0)
    tabf = jnp.asarray(rng.standard_normal((37, 2)))
    tabi = jnp.asarray(rng.integers(-5, 1000, (37, 4)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 37, (11,)), jnp.int32)
    scalar = jnp.asarray(13, jnp.int32)
    expected = [tabf[idx], tabi[idx], tabf[scalar], tabi[scalar]]
    monkeypatch.setattr(geo, "_onehot_takes", lambda: True)
    got = [
        geo.take_rows(tabf, idx), geo.take_rows(tabi, idx),
        geo.take_rows(tabf, scalar), geo.take_rows(tabi, scalar),
    ]
    for e, g in zip(expected, got):
        _np.testing.assert_array_equal(_np.asarray(e), _np.asarray(g))
        assert e.dtype == g.dtype
