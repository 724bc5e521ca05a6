"""Trajectory parity: our pure-functional car vs the reference Car, stepped
in lockstep on the real simple_layout map with identical action sequences.
The reference runs float64 numpy/math; we run float64 JAX on CPU, so poses
must agree to transcendental-rounding precision and the discrete outputs
(local path edges, maneuvers, truncation flags) must match exactly.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import SIMPLE_LAYOUT_MAP, requires_reference
from tinycarlo_tpu import car as car_mod
from tinycarlo_tpu.config import CarConfig, MapConfig
from tinycarlo_tpu.map_compiler import compile_map

CAR_CFG = dict(
    track_width=0.027,
    wheelbase=0.0487,
    max_velocity=0.15,
    max_steering_angle=30,
    steering_speed=30,
    max_acceleration=0.1,
    max_deceleration=1.0,
)
T = 1.0 / 30.0


def _setup(reference, spawn_row: int):
    from tinycarlo.car import Car
    from tinycarlo.map import Map

    ref_map = Map({"json_path": SIMPLE_LAYOUT_MAP, "pixel_per_meter": 450})
    ref_car = Car(T, ref_map, dict(CAR_CFG))

    md = compile_map(
        MapConfig(json_path=SIMPLE_LAYOUT_MAP, pixel_per_meter=450),
        dtype=jnp.float64,
    )
    cfg = CarConfig(**{k: float(v) for k, v in CAR_CFG.items()})

    # Pin both cars to the same spawn-table row.
    node = int(md.spawns.node_idx[spawn_row])
    nxt = ref_map.lanepath.get_next_nodes(node)[0]
    ref_car.position = list(ref_map.lanepath.nodes[node])
    ref_car.rotation = math.atan2(
        ref_map.lanepath.nodes[nxt][1] - ref_car.position[1],
        ref_map.lanepath.nodes[nxt][0] - ref_car.position[0],
    )
    ref_car.local_path = [(node, nxt)]
    ref_car.update_position_front()
    ref_car.steering_angle = 0.0
    ref_car.radius = 0.0
    ref_car.velocity = 0.0
    ref_car.last_maneuver = 0

    our = car_mod.car_reset(md, cfg, jnp.asarray(spawn_row))
    return ref_map, ref_car, md, cfg, our


def _actions(n, seed, maneuvers):
    rng = np.random.default_rng(seed)
    v = rng.uniform(0.2, 1.0, size=n)
    s = rng.uniform(-1.0, 1.0, size=n)
    m = rng.choice(maneuvers, size=n)
    return v, s, m


@requires_reference
@pytest.mark.parametrize("spawn_row,seed", [(0, 0), (7, 1), (33, 2), (80, 3)])
def test_trajectory_parity(reference, spawn_row, seed):
    ref_map, ref_car, md, cfg, our = _setup(reference, spawn_row)
    v, s, m = _actions(120, seed, maneuvers=[0, 0, 0, 1, 3])

    for i in range(len(v)):
        ref_trunc = ref_car.step(v[i], s[i], int(m[i]))
        our, our_trunc = car_mod.car_step(
            md, cfg, T, our, jnp.float64(v[i]), jnp.float64(s[i]), int(m[i])
        )
        assert bool(our_trunc) == bool(ref_trunc), f"truncation diverged @ {i}"
        if ref_trunc:
            break
        np.testing.assert_allclose(
            np.asarray(our.position), np.asarray(ref_car.position),
            rtol=0, atol=1e-12, err_msg=f"position diverged @ {i}",
        )
        assert float(our.rotation) == pytest.approx(ref_car.rotation, abs=1e-12)
        assert float(our.velocity) == pytest.approx(ref_car.velocity, abs=1e-15)
        assert float(our.steering_angle) == pytest.approx(
            ref_car.steering_angle, abs=1e-15
        )
        # discrete state must match exactly
        ours_path = [tuple(e) for e in np.asarray(our.local_path)]
        assert ours_path[: len(ref_car.local_path)] == [
            tuple(e) for e in ref_car.local_path
        ], f"local path diverged @ {i}"
        assert int(our.local_path_len) == len(ref_car.local_path)
        assert int(our.last_maneuver) == ref_car.last_maneuver


@requires_reference
@pytest.mark.parametrize("spawn_row", [0, 40])
def test_info_parity(reference, spawn_row):
    ref_map, ref_car, md, cfg, our = _setup(reference, spawn_row)
    v, s, m = _actions(60, 42, maneuvers=[0, 0, 3, 1])
    names = md.laneline_names
    for i in range(len(v)):
        ref_trunc = ref_car.step(v[i], s[i], int(m[i]))
        our, our_trunc = car_mod.car_step(
            md, cfg, T, our, jnp.float64(v[i]), jnp.float64(s[i]), int(m[i])
        )
        if ref_trunc:
            break
        ref_cte, ref_he, ref_d, ref_path, ref_vel = ref_car.get_info()
        info = car_mod.car_info(md, cfg, our)
        assert float(info["cte"]) == pytest.approx(ref_cte, abs=1e-12)
        assert float(info["heading_error"]) == pytest.approx(ref_he, abs=1e-12)
        assert float(info["velocity"]) == pytest.approx(ref_vel, abs=1e-15)
        for li, name in enumerate(names):
            assert float(info["laneline_distances"][li]) == pytest.approx(
                ref_d[name], abs=1e-12
            ), f"laneline {name} distance diverged @ {i}"
        got_path = np.asarray(info["local_path"])[: len(ref_path)]
        np.testing.assert_allclose(got_path, np.asarray(ref_path), atol=1e-15)


@requires_reference
def test_uturn_parity(reference):
    """Maneuver 2 triggers the u-turn re-snap state machine (car.py:130-134)."""
    ref_map, ref_car, md, cfg, our = _setup(reference, 12)
    seq = [0] * 10 + [2] * 25 + [0] * 10 + [2] * 10
    for i, man in enumerate(seq):
        ref_trunc = ref_car.step(0.8, 0.1, man)
        our, our_trunc = car_mod.car_step(
            md, cfg, T, our, jnp.float64(0.8), jnp.float64(0.1), man
        )
        assert bool(our_trunc) == bool(ref_trunc), f"truncation diverged @ {i}"
        if ref_trunc:
            break
        assert [tuple(e) for e in np.asarray(our.local_path)][
            : len(ref_car.local_path)
        ] == [tuple(e) for e in ref_car.local_path], f"u-turn path diverged @ {i}"
        assert int(our.last_maneuver) == ref_car.last_maneuver
