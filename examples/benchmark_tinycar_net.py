"""Policy-quality benchmark: per-maneuver evaluation of a TinycarCombo.

Equivalent of the reference's examples/benchmark_tinycar_net.py __main__
(:78-97): load pretrained (or a provided flax npz), evaluate per maneuver
with the standard CTE wrapper stack, print the metric line. Env flags
match the reference: ACTOR=1 swaps a provided actor into the pretrained
combo, TEMPORAL=1 uses the temporal actor (:17-18). SEQUENTIAL=1 runs
the strict-parity sequential-episode mode (reference :46-65 semantics)
instead of the default parallel batch.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

from examples._common import default_config
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.models import (
    TinycarActorTemporal,
    TinycarCombo,
    TinycarEncoder,
    load_pretrained,
    pre_obs,
)
from tinycarlo_tpu.train import evaluate as evaluate_fn
from tinycarlo_tpu.train.evaluate import combo_policy, temporal_policy
from tinycarlo_tpu.utils.helper import getenv

ENV_SEED = 10


def load_flax_npz(path):
    """Inverse of the {path: leaf} npz dump used by the IL example."""
    data = np.load(path)
    tree = {}
    for key, leaf in data.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(leaf)
    return tree


if __name__ == "__main__":
    params = fenv.make_env_params(default_config())
    obs_shape = fenv.observation_shape(params)

    model = TinycarCombo()
    variables = load_pretrained(tuple(obs_shape))
    if variables is None:
        if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
            variables = load_flax_npz(sys.argv[1])
            print(f"loaded {sys.argv[1]}")
        else:
            variables = model.init(
                jax.random.key(0),
                pre_obs(jnp.zeros((1, *obs_shape), jnp.uint8)),
                jnp.zeros((1, 3)),
            )
            print("no pretrained weights reachable; evaluating a random init")

    temporal = getenv("TEMPORAL")
    if temporal:
        enc = TinycarEncoder()
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables.get("batch_stats", {}).get("encoder", {}),
        }
        actor = TinycarActorTemporal(seq_len=10)
        actor_params = actor.init(
            jax.random.key(1), jnp.zeros((1, 10, 256)), jnp.zeros((1, 3))
        )["params"]
        pol = temporal_policy(enc, enc_vars, actor, actor_params, 10)
        carry = jnp.zeros((5, 10, 256))
    else:
        pol = combo_policy(model, variables)
        carry = None

    # SEQUENTIAL=1: the strict-parity mode reproducing the reference's
    # episode semantics exactly (benchmark_tinycar_net.py:46-65) -- one
    # env, steps*episodes sequential iterations; default is the parallel
    # batch (equivalent in expectation, maximally fast)
    sequential = getenv("SEQUENTIAL")
    for maneuver in range(3):
        r = evaluate_fn(
            pol, params, maneuver=maneuver,
            carry_init=(carry[:1] if sequential and carry is not None
                        else carry),
            steps=1000, episodes=5, seed=ENV_SEED, sequential=sequential,
        )
        np.save(f"/tmp/positions_m{maneuver}.npy", r["positions"])
        print(
            f"Maneuver {maneuver} -> Total reward: {r['total_reward']:.2f} | "
            f"CTE: {r['cte_avg']:.4f} m/step var: {r['cte_var']:.4f} | "
            f"Heading Error: {r['heading_error_avg']:.4f} rad/step var "
            f"{r['heading_error_var']:.4f} | Terminations: {r['terminations']:3d} "
            f"| perf: {r['steps_per_s']:.2f} steps/s"
        )
