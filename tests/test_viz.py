"""Overview-renderer smoke tests (host-side viz, reference renderer.py:19-79)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_env import CONFIG
from tinycarlo_tpu import env as tenv
from tinycarlo_tpu.viz import render_overview, render_static_overview


@pytest.fixture(scope="module")
def params():
    return tenv.make_env_params(CONFIG, dtype=jnp.float64)


def test_static_overview(params):
    ppm = 150
    img = render_static_overview(params, ppm)
    h, w = np.asarray(params.map_data.dimension)
    assert img.shape == (int(h * ppm), int(w * ppm), 3)
    assert img.dtype == np.uint8
    assert img.sum() > 0  # lanelines drawn


def test_overview_with_car(params):
    state, _, _ = tenv.reset(params, jax.random.key(0), render=False)
    img, cache = render_overview(params, state, 150)
    img2, _ = render_overview(params, state, 150, static_cache=cache)
    np.testing.assert_array_equal(img, img2)
    # car overlay adds pixels beyond the static map
    assert img.sum() > render_static_overview(params, 150).sum()
