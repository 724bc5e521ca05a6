"""Imitation learning from a Stanley expert with camera domain
randomization.

Equivalent of the reference's examples/train_stanley_il.py: batched expert
data collection (pitch/fov randomized per chunk, train_stanley_il.py:53-57;
OU noise :66; every-2nd-frame sampling :68-74), npz dataset caching
(:100-110), supervised MSE training of TinycarCombo (:117-124), and
per-maneuver evaluation (:139-142).

Usage: python examples/train_stanley_il.py [--samples 25000] [--steps 10000]
  [--envs 16] [--m2x N] [--chunk-steps 128] [--balance] [--no-dr]
  [--turn-weight W*100] [--dagger N [--dagger-steps M]]
(lever-by-lever measurements in docs/TRAINING.md round-5; the bundled
checkpoint is `--chunk-steps 512 --m2x 2 --balance --no-dr` at 30k/15k)
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
from tinycarlo_tpu.train import evaluate as evaluate_fn
from tinycarlo_tpu.train.evaluate import combo_policy
from tinycarlo_tpu.train.il import (
    ILConfig,
    collect_dataset,
    collect_dataset_dagger,
    create,
    save_variables_npz,
    train_chunk,
)

BUFFER_SAVEFILE = os.environ.get("IL_DATA", "/tmp/stanley_training_data.npz")


def _arg(flag, default):
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


if __name__ == "__main__":
    n_samples = _arg("--samples", 25_000)
    n_steps = _arg("--steps", 10_000)
    n_envs = _arg("--envs", 16)
    # --m2x N repeats the left maneuver N times per collection cycle
    # (left turns are rare on loop maps; see train.il.collect_dataset)
    m2x = _arg("--m2x", 1)
    cycle = (0, 1, 2) + (2,) * (m2x - 1)

    # --turn-weight W (x100): weight each sample's MSE by
    # 1 + W*min(|label|,1) (train.il.ILConfig.turn_weight) -- e.g.
    # "--turn-weight 200" is W=2.0
    turn_w = _arg("--turn-weight", 0) / 100.0

    params = fenv.make_env_params(default_config())
    # --no-dr: collect against the fixed default camera instead of the
    # reference's per-chunk pitch/fov randomization (ILConfig.camera_dr)
    cfg = ILConfig(
        steps=n_steps,
        turn_weight=turn_w,
        camera_dr="--no-dr" not in sys.argv,
    )
    obs_shape = fenv.observation_shape(params)

    # --chunk-steps: collection episode length. The default 128 steps
    # rarely reaches a junction from a fresh spawn, so maneuver-2
    # chunks are mostly straight frames LABELED left -- more m2x then
    # actively teaches "left = straight" (the round-5 sweep measured
    # m2 reward 1098 -> -659 -> -1177 at m2x 2@30k / 2@60k / 4@60k).
    # Longer chunks cover several junctions per labeled maneuver,
    # like the reference's long episodes (train_stanley_il.py:68-78).
    chunk_steps = _arg("--chunk-steps", 128)
    if os.path.exists(BUFFER_SAVEFILE):
        print(f"Loading training data from disk: {BUFFER_SAVEFILE}")
        data = np.load(BUFFER_SAVEFILE)
        X, M, Y = data["Xn"], data["Mn"], data["Yn"]
    else:
        print("Collecting training data:")
        st = time.perf_counter()
        X, M, Y = collect_dataset(
            params, cfg, jax.random.key(0), n_samples, n_envs=n_envs,
            maneuver_cycle=cycle, chunk_steps=chunk_steps,
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

    def make_data(X, M, Y):
        # device-resident dataset; batches are sampled and converted
        # on-device
        data = {
            "x": jnp.asarray(X),
            "m": jnp.asarray(M, jnp.int32),
            "y": jnp.asarray(Y),
        }
        if "--balance" in sys.argv:
            # maneuver-balanced batches (train.il.train_chunk docstring):
            # per-maneuver index pools, repeat-padded to equal length
            pools, pool_n = [], []
            mx = max((M == m).sum() for m in range(3))
            for m in range(3):
                ids = np.where(M == m)[0]
                pool_n.append(len(ids))
                pools.append(np.resize(ids, mx))
            data["pools"] = jnp.asarray(np.stack(pools), jnp.int32)
            data["pool_n"] = jnp.asarray(pool_n, jnp.int32)
            print(f"balanced batches; per-maneuver samples: {pool_n}")
        return data

    CHUNK = 500
    # data must be a jit ARGUMENT (not closed over): a captured 1.5 GB
    # constant gets baked into the compiled program
    run = jax.jit(partial(train_chunk, cfg=cfg, n_steps=CHUNK))

    def train(state, data, n_steps, key):
        losses = []
        st = time.perf_counter()
        for i in range(n_steps // CHUNK):
            key, sub = jax.random.split(key)
            state, chunk_losses = run(state, key=sub, data=data)
            losses += list(np.asarray(chunk_losses))
            print(
                f"step {(i+1)*CHUNK}/{n_steps} loss "
                f"{np.mean(losses[-CHUNK:]):.6f} "
                f"({(i+1)*CHUNK/(time.perf_counter()-st):.0f} steps/s)"
            )
        return state, losses

    print("Training:")
    state, losses = train(state, make_data(X, M, Y), cfg.steps, jax.random.key(2))

    # --dagger N: one DAgger round (train.il.collect_chunk_dagger) --
    # roll out the TRAINED policy, label with the Stanley expert, and
    # continue training on expert+correction data. Attacks the compounding
    # error on rare maneuvers that plain behavior cloning cannot fix
    # (docs/TRAINING.md round-5 maneuver-2 analysis).
    dagger_n = _arg("--dagger", 0)
    if dagger_n:
        print(f"DAgger: collecting {dagger_n} policy-rollout samples")
        st = time.perf_counter()
        Xd, Md, Yd = collect_dataset_dagger(
            params, cfg, jax.random.key(3), dagger_n,
            state.model, state.variables, n_envs=n_envs,
            maneuver_cycle=cycle, chunk_steps=chunk_steps,
        )
        print(f"collected {len(Xd)} in {time.perf_counter()-st:.1f}s")
        X = np.concatenate([X, Xd])
        M = np.concatenate([M, Md])
        Y = np.concatenate([Y, Yd])
        dagger_steps = _arg("--dagger-steps", cfg.steps // 2)
        print("DAgger retraining:")
        state, more = train(
            state, make_data(X, M, Y), dagger_steps, jax.random.key(4)
        )
        losses += more

    out = os.environ.get("IL_MODEL", "/tmp/tinycar_combo_flax.npz")
    save_variables_npz(out, state.variables)
    print(f"Saved model to: {out}")
    if os.environ.get("IL_LOSS_CSV"):
        import csv

        with open(os.environ["IL_LOSS_CSV"], "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["step", "mse_loss"])
            w.writerows((i, float(l)) for i, l in enumerate(losses))

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
