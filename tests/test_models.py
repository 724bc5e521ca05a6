"""Model-family tests: shapes, temporal-conv semantics vs torch oracle,
and torch-checkpoint import round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinycarlo_tpu.models import (
    TinycarActor,
    TinycarActorTemporal,
    TinycarCombo,
    TinycarCritic,
    TinycarCriticTemporal,
    TinycarEncoder,
    pre_obs,
)

B = 4


def test_pre_obs_layouts():
    classes = jnp.zeros((B, 5, 128, 160), jnp.uint8)
    rgb = jnp.zeros((B, 128, 160, 3), jnp.uint8)
    assert pre_obs(classes).shape == (B, 128, 160, 5)
    assert pre_obs(rgb).shape == (B, 128, 160, 3)
    x = jnp.full((2, 2, 3), 255, jnp.uint8)
    assert float(pre_obs(x).max()) == 1.0


def test_encoder_combo_shapes():
    model = TinycarCombo()
    x = jnp.zeros((B, 128, 160, 5))
    m = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 3)
    variables = model.init(jax.random.key(0), x, m)
    out = model.apply(variables, x, m)
    assert out.shape == (B, 1)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh head

    enc = TinycarEncoder()
    ev = enc.init(jax.random.key(1), x)
    f = enc.apply(ev, x)
    assert f.shape == (B, 256)
    assert np.all(np.asarray(f) >= 0)  # relu output


def test_actor_critic_shapes():
    f = jnp.ones((B, 256))
    m = jax.nn.one_hot(jnp.arange(B) % 3, 3)
    a = jnp.zeros((B, 1))
    actor = TinycarActor()
    av = actor.init(jax.random.key(0), f, m)
    assert actor.apply(av, f, m).shape == (B, 1)
    critic = TinycarCritic()
    cv = critic.init(jax.random.key(0), f, m, a)
    assert critic.apply(cv, f, m, a).shape == (B, 1)


def test_temporal_shapes():
    seq = jnp.ones((B, 10, 256))
    m = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 3)
    a = jnp.zeros((B, 1))
    actor = TinycarActorTemporal(seq_len=10)
    av = actor.init(jax.random.key(0), seq, m)
    assert actor.apply(av, seq, m).shape == (B, 1)
    critic = TinycarCriticTemporal(seq_len=10)
    cv = critic.init(jax.random.key(0), seq, m, a)
    assert critic.apply(cv, seq, m, a).shape == (B, 1)


def test_temporal_conv_matches_torch():
    """The dilated Conv1d stack treats seq_len as channels and convolves
    the feature axis (reference tinycar_net.py:76-78,88-90). Check the
    flax formulation against a torch oracle with copied weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from tinycarlo_tpu.models.tinycar_net import _TemporalConv

    rng = np.random.default_rng(0)
    seq_len, feat = 5, 32
    x = rng.standard_normal((2, seq_len, feat)).astype(np.float32)

    mod = _TemporalConv((32, 16, 16))
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))

    t = torch.tensor(x)
    chans = [(seq_len, 32, 1), (32, 16, 2), (16, 16, 4)]
    out = t
    for i, (ci, co, d) in enumerate(chans):
        w = np.asarray(variables["params"][f"Conv_{i}"]["kernel"])  # (3, ci, co)
        b = np.asarray(variables["params"][f"Conv_{i}"]["bias"])
        tw = torch.tensor(np.transpose(w, (2, 1, 0)))  # (co, ci, 3)
        out = F.relu(F.conv1d(out, tw, torch.tensor(b), padding=d, dilation=d))
    expected = out.mean(dim=1).numpy()
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-5)


def test_torch_checkpoint_import_roundtrip():
    """Build a torch TinycarCombo from the reference definition, save its
    state dict, import into flax, and check outputs agree on random input."""
    torch = pytest.importorskip("torch")
    import sys

    from tests.conftest import REFERENCE_PATH, has_reference

    if not has_reference():
        pytest.skip("reference not available")
    sys.path.insert(0, f"{REFERENCE_PATH}/examples")
    from models.tinycar_net import TinycarCombo as TorchCombo

    torch.manual_seed(0)
    image_dim = (5, 64, 160)
    tmodel = TorchCombo(image_dim)
    tmodel.eval()
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save(tmodel.state_dict(), f.name)
        from tinycarlo_tpu.models import load_torch_state_dict

        variables = load_torch_state_dict(f.name)

    rng = np.random.default_rng(1)
    x_chw = rng.random((B, *image_dim)).astype(np.float32)
    m = np.eye(3, dtype=np.float32)[rng.integers(0, 3, B)]

    with torch.no_grad():
        expected = tmodel(torch.tensor(x_chw), torch.tensor(m)).numpy()

    model = TinycarCombo()
    x_nhwc = jnp.asarray(np.transpose(x_chw, (0, 2, 3, 1)))
    ours = np.asarray(model.apply(variables, x_nhwc, jnp.asarray(m)))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_bundled_pretrained_combo_loads():
    """The package ships a combo trained by its own IL pipeline
    (docs/TRAINING.md); load_pretrained falls back to it offline."""
    import jax
    import jax.numpy as jnp

    from tinycarlo_tpu.models import TinycarCombo, load_pretrained, pre_obs

    v = load_pretrained((3, 128, 160))
    assert v is not None
    assert "encoder" in v["params"] and "actor" in v["params"]
    out = TinycarCombo().apply(
        v, pre_obs(jnp.zeros((2, 128, 160, 3), jnp.uint8)), jnp.eye(3)[:2]
    )
    assert out.shape == (2, 1)


def test_pre_obs_rank_matches_classes_decode():
    """pre_obs_rank(rank) == pre_obs(classes_from_rank(rank)): the fused
    rank decode produces the same NHWC float feed as decoding to the
    classes contract first."""
    import numpy as np

    from tinycarlo_tpu.models.tinycar_net import pre_obs, pre_obs_rank
    from tinycarlo_tpu.ops.rasterize import classes_from_rank

    rng = np.random.default_rng(3)
    rank = jnp.asarray(rng.integers(0, 6, size=(2, 16, 20), dtype=np.uint8))
    a = np.asarray(pre_obs_rank(rank, 5))
    b = np.asarray(pre_obs(classes_from_rank(rank, 5)))
    assert a.shape == (2, 16, 20, 5) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
