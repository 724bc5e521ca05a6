"""End-to-end env tests: functional core smoke + jit + vmap batch
equivalence, and full observation/reward parity against the reference
Gymnasium env on the real simple_layout map (images compared as IoU;
scalars compared tightly).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, SIMPLE_LAYOUT_MAP, requires_reference
from tinycarlo_tpu import env as tenv

CONFIG = {
    "sim": {"fps": 30, "observation_space_format": "classes"},
    "car": {
        "wheelbase": 0.0487,
        "track_width": 0.027,
        "max_velocity": 0.15,
        "max_steering_angle": 30,
        "steering_speed": 30,
        "max_acceleration": 0.1,
        "max_deceleration": 1.0,
    },
    "camera": {
        "position": [0.0, -0.005, 0.04],
        "orientation": [22, 0, 0],
        "resolution": [128, 160],
        "fov": 80,
        "max_range": 0.5,
        "line_thickness": 2,
    },
    "map": {"json_path": SIMPLE_LAYOUT_MAP, "pixel_per_meter": 450},
}


@pytest.fixture(scope="module")
def params():
    return tenv.make_env_params(CONFIG, dtype=jnp.float64)


def _action(v=0.5, s=0.1, m=0):
    return {
        "car_control": jnp.asarray([v, s], jnp.float64),
        "maneuver": jnp.asarray(m, jnp.int32),
    }


def test_reset_step_smoke(params):
    state, obs, info = tenv.reset(params, jax.random.key(0))
    assert obs.shape == (5, 128, 160) and obs.dtype == jnp.uint8
    assert int(obs.sum()) > 0, "camera should see at least one laneline"
    # reset info is the reference's 'empty info' (local path len 1)
    assert float(info["cte"]) == 0.0
    state, obs, rew, term, trunc, info = tenv.step(params, state, _action())
    assert obs.shape == (5, 128, 160)
    assert np.isfinite(float(rew))
    assert not bool(trunc)


def test_default_reward_termination(params):
    # reference env.py:87-99: reward = max(1 - cte/track_width, 0),
    # termination iff cte > 10 * track_width (both on the signed cte)
    tw = params.cfg.car.track_width
    assert float(tenv.default_reward(params, jnp.float64(0.0))) == 1.0
    assert float(tenv.default_reward(params, jnp.float64(tw))) == 0.0
    assert float(tenv.default_reward(params, jnp.float64(-tw))) == 2.0
    assert not bool(tenv.default_termination(params, jnp.float64(10 * tw)))
    assert bool(tenv.default_termination(params, jnp.float64(10.01 * tw)))


def test_jit_and_vmap_consistency(params):
    step = jax.jit(functools.partial(tenv.step, params))
    keys = jax.random.split(jax.random.key(1), 4)

    # single-env rollouts
    singles = []
    for k in keys:
        st, _, _ = tenv.reset(params, k, render=False)
        st, obs, rew, term, trunc, info = step(st, _action())
        singles.append((st, obs, rew, info["cte"]))

    # batched rollout over the same keys
    reset_b = jax.vmap(functools.partial(tenv.reset, params))
    stb, _, _ = reset_b(keys)
    step_b = jax.jit(jax.vmap(functools.partial(tenv.step, params), in_axes=(0, 0)))
    actions = {
        "car_control": jnp.broadcast_to(jnp.asarray([0.5, 0.1]), (4, 2)).astype(jnp.float64),
        "maneuver": jnp.zeros(4, jnp.int32),
    }
    stb, obs_b, rew_b, term_b, trunc_b, info_b = step_b(stb, actions)

    for i, (st, obs, rew, cte) in enumerate(singles):
        np.testing.assert_array_equal(np.asarray(obs_b[i]), np.asarray(obs))
        assert float(rew_b[i]) == float(rew)
        assert float(info_b["cte"][i]) == float(cte)


def _iou(a, b):
    a = a > 0
    b = b > 0
    u = np.logical_or(a, b).sum()
    return 1.0 if u == 0 else np.logical_and(a, b).sum() / u


@requires_reference
def test_observation_parity_vs_reference(reference, params):
    import gymnasium as gym

    ref_env = gym.make("tinycarlo-v2", config=CONFIG).unwrapped
    ref_obs, ref_info = ref_env.reset(seed=3)

    # find the spawn row the reference picked and pin ours to it
    node = ref_env.car.local_path[0][0]
    rows = np.asarray(params.map_data.spawns.node_idx)
    row = int(np.nonzero(rows == node)[0][0])
    state, obs, info = tenv.reset(params, jax.random.key(0), spawn_row=row)

    assert _iou(np.asarray(obs), ref_obs) > 0.6

    total_iou = []
    for i in range(40):
        a = {"car_control": np.asarray([0.6, np.sin(i * 0.3)]), "maneuver": 0}
        ref_obs, ref_rew, ref_term, ref_trunc, ref_info = ref_env.step(a)
        state, obs, rew, term, trunc, info = tenv.step(
            params, state, _action(0.6, float(np.sin(i * 0.3)), 0)
        )
        assert float(rew) == pytest.approx(ref_rew, abs=1e-9)
        assert bool(term) == ref_term
        assert bool(trunc) == ref_trunc
        assert float(info["cte"]) == pytest.approx(ref_info["cte"], abs=1e-9)
        total_iou.append(_iou(np.asarray(obs), ref_obs))
        if ref_term or ref_trunc:
            break
    assert np.mean(total_iou) > 0.7, f"obs IoU {np.mean(total_iou):.3f}"


@requires_reference
def test_rgb_observation_parity(reference, params):
    import gymnasium as gym

    cfg = {**CONFIG, "sim": {**CONFIG["sim"], "observation_space_format": "rgb"}}
    ref_env = gym.make("tinycarlo-v2", config=cfg).unwrapped
    ref_obs, _ = ref_env.reset(seed=11)
    node = ref_env.car.local_path[0][0]
    p = tenv.make_env_params(cfg, dtype=jnp.float64)
    rows = np.asarray(p.map_data.spawns.node_idx)
    row = int(np.nonzero(rows == node)[0][0])
    _, obs, _ = tenv.reset(p, jax.random.key(0), spawn_row=row)
    assert obs.shape == ref_obs.shape == (128, 160, 3)
    assert _iou(np.asarray(obs).sum(-1), ref_obs.sum(-1)) > 0.6


def test_rgb_planar_matches_rgb():
    """The rgb_planar extension is the rgb frame transposed to (3, H, W)
    -- same pixels, lane-friendly layout (docs/KERNELS.md round-4)."""
    import numpy as _np

    cfg = dict(CONFIG)
    cfg["camera"] = dict(CONFIG["camera"], resolution=[32, 40])
    cfg["sim"] = dict(CONFIG["sim"], observation_space_format="rgb")
    p_rgb = tenv.make_env_params(cfg, dtype=jnp.float64)
    cfg2 = dict(cfg)
    cfg2["sim"] = dict(cfg["sim"], observation_space_format="rgb_planar")
    p_pl = tenv.make_env_params(cfg2, dtype=jnp.float64)
    assert tenv.observation_shape(p_pl) == (3, 32, 40)

    state = tenv.reset(p_rgb, jax.random.key(5))[0]
    hwc = _np.asarray(tenv.render_observation(p_rgb, state))
    planar = _np.asarray(tenv.render_observation(p_pl, state))
    _np.testing.assert_array_equal(planar, _np.moveaxis(hwc, -1, 0))
    assert hwc.sum() > 0

    from tinycarlo_tpu import vector

    vstate, _ = vector.reset(p_rgb, jax.random.key(6), 4, render=False)
    hwc_b = _np.asarray(tenv.render_observation_batch(p_rgb, vstate.env))
    pl_b = _np.asarray(tenv.render_observation_batch(p_pl, vstate.env))
    _np.testing.assert_array_equal(pl_b, _np.moveaxis(hwc_b, -1, 1))


def test_rank_format_decodes_to_rgb_and_classes():
    """The "rank" extension (1 byte/pixel paint-order layer map) decodes
    bit-identically to the rgb frame via the palette, and its
    classes_from_rank one-hot agrees with the class masks everywhere the
    masks don't overlap (rank keeps only the last-painted layer,
    reference renderer.py:41-43)."""
    import numpy as _np

    from tinycarlo_tpu.ops import rasterize as ras

    cfg = dict(CONFIG)
    cfg["camera"] = dict(CONFIG["camera"], resolution=[32, 40])
    cfg["sim"] = dict(CONFIG["sim"], observation_space_format="rank")
    p_rank = tenv.make_env_params(cfg, dtype=jnp.float64)
    assert tenv.observation_shape(p_rank) == (32, 40)
    cfg2 = dict(cfg)
    cfg2["sim"] = dict(cfg["sim"], observation_space_format="rgb")
    p_rgb = tenv.make_env_params(cfg2, dtype=jnp.float64)
    cfg3 = dict(cfg)
    cfg3["sim"] = dict(cfg["sim"], observation_space_format="classes")
    p_cls = tenv.make_env_params(cfg3, dtype=jnp.float64)

    # single-env path
    state, rank_obs, _ = tenv.reset(p_rank, jax.random.key(7))
    assert rank_obs.shape == (32, 40) and rank_obs.dtype == jnp.uint8
    rgb = _np.asarray(tenv.render_observation(p_rgb, state))
    _np.testing.assert_array_equal(
        _np.asarray(ras.rgb_from_rank(rank_obs, p_rgb.map_data.laneline_colors)),
        rgb,
    )
    assert int(_np.asarray(rank_obs).sum()) > 0

    # batched path + classes round-trip
    from tinycarlo_tpu import vector

    vstate, _ = vector.reset(p_rank, jax.random.key(8), 4, render=False)
    rank_b = _np.asarray(tenv.render_observation_batch(p_rank, vstate.env))
    cls_b = _np.asarray(tenv.render_observation_batch(p_cls, vstate.env))
    assert rank_b.shape == (4, 32, 40)
    _np.testing.assert_array_equal(
        rank_b, _np.asarray(ras.rank_from_masks(jnp.asarray(cls_b)))
    )
    dec = _np.asarray(
        ras.classes_from_rank(jnp.asarray(rank_b), p_cls.map_data.n_layers)
    )
    # wherever the decoded one-hot is set, the true mask is set (the
    # converse fails only at overlaps, where rank keeps the top layer)
    assert _np.all(cls_b[dec > 0] > 0)
    no_overlap = _np.broadcast_to(
        (cls_b > 0).sum(1, keepdims=True) <= 1, dec.shape
    )
    _np.testing.assert_array_equal(dec[no_overlap], cls_b[no_overlap])
