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
    """TP-sharded critic produces identical outputs to the replicated one."""
    mesh = parallel.make_mesh(model=2)
    critic = TinycarCritic()
    f = jnp.ones((8, 256), jnp.float32)
    m = jax.nn.one_hot(jnp.zeros((8,), jnp.int32), 3)
    a = jnp.zeros((8, 1), jnp.float32)
    variables = critic.init(jax.random.key(0), f, m, a)
    expected = critic.apply(variables, f, m, a)

    sharded_params = parallel.shard_params(variables["params"], mesh)
    got = jax.jit(
        lambda p, f, m, a: critic.apply({"params": p}, f, m, a)
    )(sharded_params, f, m, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5)
    # at least one leaf is actually sharded over the model axis
    specs = [
        x.sharding.spec
        for x in jax.tree.leaves(sharded_params)
        if hasattr(x, "sharding")
    ]
    assert any("model" in str(s) for s in specs)


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
