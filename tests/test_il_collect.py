"""IL data-collection pipeline on CPU: camera randomization per chunk,
expert labels, skip-steps sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_env import CONFIG
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.train.il import ILConfig, collect_dataset, randomize_camera


@pytest.fixture(scope="module")
def params():
    cfg = dict(CONFIG)
    cfg["camera"] = dict(CONFIG["camera"], resolution=[32, 40])
    return fenv.make_env_params(cfg, dtype=jnp.float32)


def test_collect_dataset(params):
    X, M, Y = collect_dataset(
        params, ILConfig(), jax.random.key(0), n_samples=120, n_envs=4,
        chunk_steps=32,
    )
    assert X.shape == (120, *fenv.observation_shape(params))
    assert X.dtype == np.uint8 and (X > 0).any()
    assert set(np.unique(M)).issubset({0.0, 1.0, 2.0})
    assert np.isfinite(Y).all()
    # expert labels vary (the Stanley controller actually steers)
    assert Y.std() > 0


def test_randomize_camera_changes_matrices(params):
    p1 = randomize_camera(params, jax.random.key(1))
    p2 = randomize_camera(params, jax.random.key(2))
    assert not np.allclose(np.asarray(p1.camera.E), np.asarray(p2.camera.E))
    assert not np.allclose(np.asarray(p1.camera.K), np.asarray(p2.camera.K))
    # pitch in [10,20), fov in [90,130) per the reference randomization:
    # fov determines fx = w/(2 tan(fov/2))
    w = params.cfg.camera.resolution[1]
    for p in (p1, p2):
        fx = float(p.camera.K[0, 0])
        import math

        fov = 2 * math.atan(w / (2 * fx))
        assert math.radians(89) < fov < math.radians(131)


def test_collect_dataset_dagger(params):
    """Policy-rollout collection: the car follows the (untrained) net,
    labels are the Stanley expert's steering at the visited states."""
    from tinycarlo_tpu.train.il import collect_dataset_dagger, create

    cfg = ILConfig()
    state = create(jax.random.key(9), fenv.observation_shape(params), cfg)
    X, M, Y = collect_dataset_dagger(
        params, cfg, jax.random.key(0), n_samples=60,
        model=state.model, variables=state.variables,
        n_envs=4, chunk_steps=16,
    )
    assert X.shape == (60, *fenv.observation_shape(params))
    assert X.dtype == np.uint8 and (X > 0).any()
    assert set(np.unique(M)).issubset({0.0, 1.0, 2.0})
    assert np.isfinite(Y).all() and Y.std() > 0
