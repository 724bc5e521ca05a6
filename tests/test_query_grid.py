"""Spatial-pruning grid (map_compiler.LanelineGrid): car_info's
per-laneline nearest-edge queries through the grid must be bitwise
identical to the full packed scan (which itself mirrors the reference's
per-layer scans, tinycarlo/layer.py:33-44 / car.py:56-64) for every
position inside the grid's inflated-bbox domain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import KNUFFINGEN_MAP, SIMPLE_LAYOUT_MAP
from tinycarlo_tpu import car as car_mod
from tinycarlo_tpu.config import CarConfig, MapConfig
from tinycarlo_tpu.map_compiler import compile_map


def _maps(json_path, ppm, dtype, **grid_kw):
    grid_kw.setdefault("query_grid", True)
    md_g = compile_map(
        MapConfig(json_path=json_path, pixel_per_meter=ppm, **grid_kw),
        dtype=dtype,
    )
    md_f = compile_map(
        MapConfig(json_path=json_path, pixel_per_meter=ppm, query_grid=False),
        dtype=dtype,
    )
    return md_g, md_f


def _states(md, positions, dtype):
    n = positions.shape[0]
    edge = md.lanepath.edges[0]
    rot = jnp.linspace(-3.0, 3.0, n).astype(dtype)
    wheelbase = dtype.type(0.0487)
    front = positions + wheelbase * jnp.stack(
        [jnp.cos(rot), jnp.sin(rot)], axis=-1
    )
    return car_mod.CarState(
        position=positions,
        position_front=front,
        rotation=rot,
        steering_angle=jnp.zeros((n,), dtype),
        radius=jnp.zeros((n,), dtype),
        velocity=jnp.full((n,), 0.1, dtype),
        local_path=jnp.broadcast_to(edge, (n, car_mod.PATH_LEN, 2)).astype(
            jnp.int32
        ),
        local_path_len=jnp.full((n,), 2, jnp.int32),
        last_maneuver=jnp.zeros((n,), jnp.int32),
    )


def _fuzz_positions(grid, n, seed, dtype):
    """Uniform positions over the grid's full domain (inflated bbox)."""
    rng = np.random.default_rng(seed)
    o = np.asarray(grid.origin, np.float64)
    cell = 1.0 / float(grid.inv_cell)
    hi = o + np.asarray([grid.nx * cell, grid.ny * cell])
    pos = rng.uniform(o, hi, size=(n, 2))
    # sprinkle exact cell-boundary and node-coincident points
    pos[: n // 8] = o + np.round((pos[: n // 8] - o) / cell) * cell
    return jnp.asarray(pos, dtype)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
def test_grid_matches_full_scan_simple_layout(dtype):
    dtype = jnp.dtype(dtype)
    md_g, md_f = _maps(SIMPLE_LAYOUT_MAP, 450, dtype)
    assert md_g.laneline_grid is not None
    pos = _fuzz_positions(md_g.laneline_grid, 512, 0, dtype)
    st = _states(md_g, pos, dtype)
    cfg = CarConfig()
    info_g = jax.vmap(lambda s: car_mod.car_info(md_g, cfg, s))(st)
    info_f = jax.vmap(lambda s: car_mod.car_info(md_f, cfg, s))(st)
    for k in info_f:
        np.testing.assert_array_equal(
            np.asarray(info_g[k]), np.asarray(info_f[k]), err_msg=k
        )


def test_grid_matches_full_scan_knuffingen():
    dtype = jnp.dtype(jnp.float64)
    md_g, md_f = _maps(KNUFFINGEN_MAP, 150, dtype)
    assert md_g.laneline_grid is not None
    pos = _fuzz_positions(md_g.laneline_grid, 256, 1, dtype)
    st = _states(md_g, pos, dtype)
    cfg = CarConfig()
    info_g = jax.vmap(lambda s: car_mod.car_info(md_g, cfg, s))(st)
    info_f = jax.vmap(lambda s: car_mod.car_info(md_f, cfg, s))(st)
    for k in info_f:
        np.testing.assert_array_equal(
            np.asarray(info_g[k]), np.asarray(info_f[k]), err_msg=k
        )


def test_grid_invariants():
    md_g, _ = _maps(SIMPLE_LAYOUT_MAP, 450, jnp.float64)
    g = md_g.laneline_grid
    idx = np.asarray(g.cand_idx)
    bounds = g.layer_bounds
    pb = md_g.packed_layer_bounds
    for l in range(md_g.n_layers):
        block = idx[:, bounds[l]: bounds[l + 1]]
        if pb[l + 1] > pb[l]:
            # every cell keeps at least one candidate per non-empty layer
            assert (block >= 0).any(axis=1).all()
        live = block >= 0
        # candidates are packed first and keep ascending packed order
        for row, msk in zip(block, live):
            v = row[msk]
            assert np.all(np.diff(v) > 0)
            assert np.all(v >= pb[l]) and np.all(v < pb[l + 1])
            assert not msk[np.argmin(msk)] if not msk.all() else True
