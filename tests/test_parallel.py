"""Parallelism tests on the virtual 8-device CPU mesh: DP batch sharding,
TP param sharding with unchanged numerics, SP rasterization bit-equality,
and the graft-entry dryrun."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinycarlo_tpu import parallel
from tinycarlo_tpu.models import TinycarCritic
from tinycarlo_tpu.ops import rasterize as ras
from tinycarlo_tpu.parallel.sp import rasterize_masks_sp


def test_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8
    mesh2 = parallel.make_mesh(model=2)
    assert dict(zip(mesh2.axis_names, mesh2.devices.shape)) == {
        "data": 4,
        "model": 2,
    }


def test_tp_critic_numerics_unchanged():
    """TP-sharded critic produces identical outputs to the replicated one,
    and the plan shards EXACTLY the intended matmuls (by explicit layer
    name -- renaming a module breaks this test, not the sharding)."""
    mesh = parallel.make_mesh(model=2)
    critic = TinycarCritic()
    f = jnp.ones((8, 256), jnp.float32)
    m = jax.nn.one_hot(jnp.zeros((8,), jnp.int32), 3)
    a = jnp.zeros((8, 1), jnp.float32)
    variables = critic.init(jax.random.key(0), f, m, a)
    expected = critic.apply(variables, f, m, a)

    plan = parallel.tp_plan(variables["params"])
    assert plan == {
        ("fc1", "kernel"): "column",
        ("fc1", "bias"): "column",
        ("fc2", "kernel"): "row",
    }, plan

    sharded_params = parallel.shard_params(variables["params"], mesh)
    got = jax.jit(
        lambda p, f, m, a: critic.apply({"params": p}, f, m, a)
    )(sharded_params, f, m, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5)
    # the planned leaves really carry the model axis on device
    flat = jax.tree_util.tree_flatten_with_path(sharded_params)[0]
    for path, leaf in flat:
        names = tuple(getattr(k, "key", str(k)) for k in path)
        sharded = "model" in str(leaf.sharding.spec)
        assert sharded == (names in plan), (names, leaf.sharding.spec)


def test_tp_actor_plan_and_numerics():
    """Actor trunk (fcm2/fcm3) and head (fc1/fc2) pairs are sharded; the
    sharded apply matches the replicated one."""
    from tinycarlo_tpu.models import TinycarActor

    mesh = parallel.make_mesh(model=2)
    actor = TinycarActor()
    f = jnp.ones((8, 256), jnp.float32)
    m = jax.nn.one_hot(jnp.zeros((8,), jnp.int32), 3)
    variables = actor.init(jax.random.key(0), f, m)
    expected = actor.apply(variables, f, m)

    plan = parallel.tp_plan(variables["params"])
    assert plan == {
        ("_ManeuverTrunk_0", "fcm2", "kernel"): "column",
        ("_ManeuverTrunk_0", "fcm2", "bias"): "column",
        ("_ManeuverTrunk_0", "fcm3", "kernel"): "row",
        ("_ActorHead_0", "fc1", "kernel"): "column",
        ("_ActorHead_0", "fc1", "bias"): "column",
        ("_ActorHead_0", "fc2", "kernel"): "row",
    }, plan

    sharded_params = parallel.shard_params(variables["params"], mesh)
    got = jax.jit(lambda p, f, m: actor.apply({"params": p}, f, m))(
        sharded_params, f, m
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5)


def test_sp_rasterize_bit_equal():
    mesh = parallel.make_mesh(model=2)
    rng = np.random.default_rng(0)
    L, E, H, W = 3, 16, 32, 48
    p0 = jnp.asarray(rng.uniform(0, W, (L, E, 2)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(0, H, (L, E, 2)), jnp.float32)
    draw = jnp.asarray(rng.random((L, E)) < 0.7)
    expected = ras.rasterize_masks(p0, p1, draw, (H, W), 2)
    got = rasterize_masks_sp(p0, p1, draw, (H, W), 2, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sp_packed_kernel_bit_equal():
    """Production SP: the packed segment axis sharded through the Pallas
    kernel (compaction included) is bit-equal to the unsharded kernel."""
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
    )
    from tinycarlo_tpu.parallel.sp import rasterize_masks_packed_sp

    mesh = parallel.make_mesh(model=4)
    rng = np.random.default_rng(5)
    B, E, H, W, L = 4, 50, 32, 160, 3  # E % 4 != 0: exercises padding
    u0 = jnp.asarray(rng.uniform(-5, W + 5, (B, E)), jnp.float32)
    v0 = jnp.asarray(rng.uniform(-5, H + 5, (B, E)), jnp.float32)
    u1 = u0 + jnp.asarray(rng.uniform(-30, 30, (B, E)), jnp.float32)
    v1 = v0 + jnp.asarray(rng.uniform(-12, 12, (B, E)), jnp.float32)
    draw = jnp.asarray(rng.random((B, E)) < 0.7)
    edge_layer = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)

    expected = rasterize_masks_packed_pallas_soa(
        u0, v0, u1, v1, draw, edge_layer, L, (H, W), 2, interpret=True
    )
    got = rasterize_masks_packed_sp(
        u0, v0, u1, v1, draw, edge_layer, L, (H, W), 2, mesh,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    assert np.asarray(expected).sum() > 0
    # DP x SP: batch sharded over data simultaneously
    got_dp = rasterize_masks_packed_sp(
        u0, v0, u1, v1, draw, edge_layer, L, (H, W), 2, mesh,
        data_sharded=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_dp), np.asarray(expected))


def test_sp_env_observation_bit_equal():
    """render_observation_batch_sp == unsharded production path on a real
    map/camera, including projection on the sharded edge axis."""
    from tests.test_env import CONFIG
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
    )
    from tinycarlo_tpu.parallel.sp import render_observation_batch_sp

    cfg = dict(CONFIG)
    cfg["camera"] = dict(CONFIG["camera"], resolution=[32, 40])
    params = fenv.make_env_params(cfg, dtype=jnp.float32)
    mesh = parallel.make_mesh(model=2)
    vstate, _ = vector.reset(params, jax.random.key(2), 4, render=False)

    u0, v0, u1, v1, draw = fenv._project_packed_batch_soa(params, vstate.env)
    expected = rasterize_masks_packed_pallas_soa(
        u0, v0, u1, v1, draw, params.map_data.packed_edge_layer,
        params.map_data.n_layers, (32, 40),
        params.cfg.camera.line_thickness,
        max_visible=params.cfg.camera.max_visible_segments,
        interpret=True,
        layer_bounds=params.map_data.packed_layer_bounds or None,
    )
    got = render_observation_batch_sp(
        params, vstate.env, mesh, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    assert np.asarray(expected).sum() > 0
    got_dp = render_observation_batch_sp(
        params, vstate.env, mesh, data_sharded=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_dp), np.asarray(expected))


def test_sp_exact_stroke_bit_equal():
    """SP honors camera.stroke="exact" (round-4 verdict item 3): the
    sharded renderer routes the bit-exact cv2 t>=2 stamp per shard and
    the psum-OR combine reproduces the unsharded exact frame bit for
    bit -- on the raw packed kernel and on the full env render path."""
    import dataclasses

    from tests.test_env import CONFIG
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.ops.rasterize_pallas import (
        rasterize_masks_packed_pallas_soa,
    )
    from tinycarlo_tpu.parallel.sp import (
        rasterize_masks_packed_sp,
        render_observation_batch_sp,
    )

    mesh = parallel.make_mesh(model=2)
    rng = np.random.default_rng(9)
    B, E, H, W, L, t = 3, 30, 32, 160, 3, 3
    u0 = jnp.asarray(rng.uniform(-60, W + 60, (B, E)), jnp.float64)
    v0 = jnp.asarray(rng.uniform(-60, H + 60, (B, E)), jnp.float64)
    u1 = u0 + jnp.asarray(rng.uniform(-80, 80, (B, E)), jnp.float64)
    v1 = v0 + jnp.asarray(rng.uniform(-40, 40, (B, E)), jnp.float64)
    draw = jnp.asarray(rng.random((B, E)) < 0.8)
    edge_layer = jnp.asarray(rng.integers(0, L, (E,)), jnp.int32)
    expected = rasterize_masks_packed_pallas_soa(
        u0, v0, u1, v1, draw, edge_layer, L, (H, W), t, interpret=True,
        stroke="exact",
    )
    got = rasterize_masks_packed_sp(
        u0, v0, u1, v1, draw, edge_layer, L, (H, W), t, mesh,
        interpret=True, stroke="exact",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    assert np.asarray(expected).sum() > 0

    # full env render path: camera.stroke from the config is honored
    cfg = dict(CONFIG)
    cfg["camera"] = dict(
        CONFIG["camera"], resolution=[32, 40], line_thickness=2,
    )
    params = fenv.make_env_params(cfg, dtype=jnp.float32)
    params = params.replace(cfg=dataclasses.replace(
        params.cfg,
        camera=dataclasses.replace(params.cfg.camera, stroke="exact"),
    ))
    vstate, _ = vector.reset(params, jax.random.key(2), 4, render=False)
    expected_env = fenv.render_observation_batch(params, vstate.env)
    got_env = render_observation_batch_sp(
        params, vstate.env, mesh, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got_env), np.asarray(expected_env)
    )
    assert np.asarray(expected_env).sum() > 0


def test_sp_chunk_bit_equal():
    """The fused TD3 chunk with the SP observation renderer composed
    INSIDE it (chunk(obs_render_fn=render_observation_batch_sp) under a
    data x model mesh) is bit-equal to the unsharded chunk -- the
    DP x TP x SP training step is one program, not a piecewise demo."""
    from functools import partial

    from tests.test_env import CONFIG
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu.parallel.sp import render_observation_batch_sp
    from tinycarlo_tpu.train import td3
    from tinycarlo_tpu.train.td3_loop import LoopConfig, chunk, init_loop

    cfg_d = dict(CONFIG)
    cfg_d["camera"] = dict(CONFIG["camera"], resolution=[16, 24])
    params = fenv.make_env_params(cfg_d, dtype=jnp.float32)
    mesh = parallel.make_mesh(model=2)

    cfg = td3.TD3Config(seq_len=2, batch_size=4)
    loop_cfg = LoopConfig(
        replay_size=32, max_episode_steps=16, obs_dtype=jnp.float32
    )
    n_envs = 4

    def encoder_apply(obs):
        x = obs.astype(jnp.float32)
        f = x.reshape(x.shape[0], -1)
        pad = 256 - (f.shape[1] % 256)
        f = jnp.pad(f, ((0, 0), (0, pad)))
        return f.reshape(x.shape[0], -1, 256).mean(axis=1)

    state0 = init_loop(params, cfg, loop_cfg, jax.random.key(0), n_envs)

    base = partial(
        chunk, params=params, cfg=cfg, loop_cfg=loop_cfg,
        encoder_apply=encoder_apply, n_steps=3,
    )
    state_ref, out_ref = jax.jit(base)(state0)

    sp_render = lambda p, env_state, out_dtype: (
        render_observation_batch_sp(
            p, env_state, mesh, data_sharded=True, out_dtype=out_dtype,
            interpret=True,
        )
    )
    with jax.sharding.set_mesh(mesh):
        state_sp, out_sp = jax.jit(
            partial(base, obs_render_fn=sp_render)
        )(jax.device_get(state0))

    for k in out_ref:
        if k.endswith("_loss") or k == "laneline_distances":
            # cross-batch REDUCTIONS (the update losses, the batch-mean
            # distance diagnostic) compile under the mesh's SPMD
            # partitioner, whose reduction order can differ by an f32
            # ulp; every PER-ENV output and the ROLLOUT path (obs ->
            # features -> replay) must be bitwise identical and are
            # asserted exactly below
            np.testing.assert_allclose(
                np.asarray(out_ref[k]), np.asarray(out_sp[k]),
                rtol=1e-6, err_msg=k,
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(out_ref[k]), np.asarray(out_sp[k]), err_msg=k
            )
    np.testing.assert_array_equal(
        np.asarray(state_ref.queue), np.asarray(state_sp.queue)
    )
    np.testing.assert_array_equal(
        np.asarray(state_ref.buf.storage["x"]), np.asarray(state_sp.buf.storage["x"])
    )


def test_sp_rank_format_bit_equal():
    """SP rank rendering (fmt="rank", pmax combine) equals the unsharded
    rank observation bit for bit -- fast stroke (per-shard rank kernel)
    AND exact t>=2 stroke (rank derived from the psum-OR'd exact
    masks)."""
    import dataclasses

    from tests.test_env import CONFIG
    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector
    from tinycarlo_tpu.parallel.sp import render_observation_batch_sp

    mesh = parallel.make_mesh(model=2)
    cfg = dict(CONFIG)
    cfg["camera"] = dict(
        CONFIG["camera"], resolution=[32, 40], line_thickness=2,
    )
    cfg["sim"] = dict(CONFIG["sim"], observation_space_format="rank")
    params = fenv.make_env_params(cfg, dtype=jnp.float32)
    vstate, _ = vector.reset(params, jax.random.key(3), 4, render=False)

    expected = fenv.render_observation_batch(params, vstate.env)
    got = render_observation_batch_sp(
        params, vstate.env, mesh, interpret=True, fmt="rank"
    )
    assert got.shape == expected.shape == (4, 32, 40)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    assert np.asarray(expected).sum() > 0

    params_x = params.replace(cfg=dataclasses.replace(
        params.cfg,
        camera=dataclasses.replace(params.cfg.camera, stroke="exact"),
    ))
    expected_x = fenv.render_observation_batch(params_x, vstate.env)
    got_x = render_observation_batch_sp(
        params_x, vstate.env, mesh, interpret=True, fmt="rank"
    )
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(expected_x))

    with pytest.raises(ValueError):
        render_observation_batch_sp(
            params, vstate.env, mesh, interpret=True, fmt="rgb"
        )
