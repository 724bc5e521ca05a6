"""Imitation learning from a Stanley expert with camera domain
randomization.

Equivalent of the reference's examples/train_stanley_il.py: batched expert
data collection (pitch/fov randomized per chunk, train_stanley_il.py:53-57;
OU noise :66; every-2nd-frame sampling :68-74), npz dataset caching
(:100-110), supervised MSE training of TinycarCombo (:117-124), and
per-maneuver evaluation (:139-142).

Usage: python examples/train_stanley_il.py [--samples 25000] [--steps 10000]
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

from examples._common import default_config
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.models import pre_obs
from tinycarlo_tpu.train import evaluate as evaluate_fn
from tinycarlo_tpu.train.evaluate import combo_policy
from tinycarlo_tpu.train.il import (
    ILConfig,
    collect_dataset,
    create,
    train_step,
)

BUFFER_SAVEFILE = os.environ.get("IL_DATA", "/tmp/stanley_training_data.npz")


def _arg(flag, default):
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


if __name__ == "__main__":
    n_samples = _arg("--samples", 25_000)
    n_steps = _arg("--steps", 10_000)
    n_envs = _arg("--envs", 16)

    params = fenv.make_env_params(default_config())
    cfg = ILConfig(steps=n_steps)
    obs_shape = fenv.observation_shape(params)

    if os.path.exists(BUFFER_SAVEFILE):
        print(f"Loading training data from disk: {BUFFER_SAVEFILE}")
        data = np.load(BUFFER_SAVEFILE)
        X, M, Y = data["Xn"], data["Mn"], data["Yn"]
    else:
        print("Collecting training data:")
        st = time.perf_counter()
        X, M, Y = collect_dataset(
            params, cfg, jax.random.key(0), n_samples, n_envs=n_envs
        )
        print(
            f"collected {len(X)} samples in {time.perf_counter()-st:.1f}s "
            f"({len(X)/(time.perf_counter()-st):,.0f} samples/s)"
        )
        np.savez_compressed(BUFFER_SAVEFILE, Xn=X, Mn=M, Yn=Y)
    print(
        f"Training data: {sum(a.size * a.itemsize for a in (X, M, Y))/1e9:.2f} GB "
        f"| type: {X.dtype} | shape: {X.shape}"
    )

    state = create(jax.random.key(1), obs_shape, cfg)
    step = jax.jit(partial(train_step, cfg=cfg))
    # device-side dataset + uint8->float conversion per batch
    Xd, Md, Yd = jnp.asarray(X), jnp.asarray(M, jnp.int32), jnp.asarray(Y)

    print("Training:")
    rng = np.random.default_rng(0)
    losses, acc = [], 0.0
    st = time.perf_counter()
    for i in range(cfg.steps):
        idx = jnp.asarray(rng.integers(0, len(X), cfg.batch_size))
        batch = {
            "x": pre_obs(Xd[idx]),
            "m": jax.nn.one_hot(Md[idx], cfg.maneuver_dim),
            "y": Yd[idx],
        }
        state, loss = step(state, batch=batch)
        acc += float(loss)
        if (i + 1) % 500 == 0:
            losses.append(acc / 500)
            print(
                f"step {i+1}/{cfg.steps} loss {losses[-1]:.6f} "
                f"({(i+1)/(time.perf_counter()-st):.0f} steps/s)"
            )
            acc = 0.0

    out = os.environ.get("IL_MODEL", "/tmp/tinycar_combo_flax.npz")
    flat = jax.tree_util.tree_flatten_with_path(jax.device_get(state.variables))
    np.savez(
        out,
        **{
            "/".join(str(getattr(k, "key", k)) for k in path): leaf
            for path, leaf in flat[0]
        },
    )
    print(f"Saved model to: {out}")

    print("Evaluating:")
    pol = combo_policy(state.model, state.variables)
    for maneuver in range(3):
        r = evaluate_fn(
            pol, params, maneuver=maneuver, carry_init=None,
            steps=1000, episodes=5,
        )
        print(
            f"Maneuver {maneuver} -> Total reward: {r['total_reward']:.2f} | "
            f"CTE: {r['cte_avg']:.4f} m/step var: {r['cte_var']:.4f} | "
            f"Heading Error: {r['heading_error_avg']:.4f} rad/step var "
            f"{r['heading_error_var']:.4f} | Terminations: {r['terminations']:3d} "
            f"| perf: {r['steps_per_s']:.2f} steps/s"
        )
