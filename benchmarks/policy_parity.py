"""Policy-level observation-parity check across renderers.

The pixel-level rasterizer tests (tests/test_rasterize.py) bound cv2
agreement geometrically; this harness measures what actually matters for
checkpoint portability: does the SAME policy behave the same when driven
by (a) this framework's kernel-rendered frames and (b) the reference's
cv2-rendered frames (reference renderer.py:36-51)?

Protocol: the bundled IL-trained TinycarCombo (models/pretrained/) is
evaluated per maneuver under the reference evaluate() semantics
(benchmark_tinycar_net.py:23-76 -- sequential episodes, reset on
termination and every `steps` iterations, CTE reward/termination stack)
on both environments, same map/config. Spawn RNG streams differ (the
reference draws from gymnasium's np_random; ours from jax.random), so
metrics are compared as per-step averages over the same step budget, not
trajectory-for-trajectory.

Usage: python benchmarks/policy_parity.py [--steps 500] [--episodes 4]
CPU-friendly (forces the cpu backend: single-env stepping is
latency-bound on a tunneled chip).
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _arg(flag, default):
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def our_eval(variables, maneuver, steps, episodes, stroke="fast"):
    import yaml

    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu.models import TinycarCombo
    from tinycarlo_tpu.train.evaluate import combo_policy, evaluate

    cfg_path = os.path.join(REPO, "examples/config_simple_layout.yaml")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["map"]["json_path"] = os.path.join(
        REPO, "examples/maps/simple_layout.json"
    )
    # --stroke exact: the bit-exact cv2 t>=2 stroke replica
    # (ops/cv2_stroke.py) -- the checkpoint-portability configuration
    cfg["camera"]["stroke"] = stroke
    params = fenv.make_env_params(cfg, dtype=jnp.float32)
    pol = combo_policy(TinycarCombo(), variables)
    r = evaluate(
        pol, params, maneuver=maneuver, carry_init=None, steps=steps,
        episodes=episodes, sequential=True,
    )
    r.pop("positions")
    return r


def reference_eval(variables, maneuver, steps, episodes):
    """The reference evaluate() loop (benchmark_tinycar_net.py:23-76)
    driven by the flax combo on cv2-rendered observations."""
    if not os.path.isdir(os.path.join(REFERENCE, "tinycarlo")):
        return None
    sys.path.insert(0, REFERENCE)
    from tinycarlo.env import TinyCarloEnv
    from tinycarlo.wrapper.reward import CTELinearRewardWrapper
    from tinycarlo.wrapper.termination import (
        CrashTerminationWrapper,
        CTETerminationWrapper,
    )

    from tinycarlo_tpu.models import TinycarCombo, pre_obs

    import yaml

    with open(os.path.join(REPO, "examples/config_simple_layout.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["map"]["json_path"] = os.path.join(
        REPO, "examples/maps/simple_layout.json"
    )
    env = TinyCarloEnv(config=cfg)
    env = CTELinearRewardWrapper(env, min_cte=0.03, max_reward=1.0, min_reward=-1.0)
    env = CTETerminationWrapper(env, max_cte=0.1, number_of_steps=5)
    env = CrashTerminationWrapper(env)

    model = TinycarCombo()
    m_onehot = jnp.eye(3)[maneuver][None]
    apply = jax.jit(lambda obs: model.apply(variables, pre_obs(obs), m_onehot))

    speed = 0.35
    obs = env.reset(seed=0)[0]
    total_rew, cte, he, terminations = 0.0, [], [], 0
    for i in range(steps * episodes):
        steering = float(apply(jnp.asarray(obs[None]))[0, 0])
        obs, rew, term, trunc, info = env.step(
            {"car_control": [speed, steering],
             "maneuver": maneuver if maneuver != 2 else 3}
        )
        total_rew += rew
        cte.append(abs(info["cte"]))
        he.append(abs(info["heading_error"]))
        if term or trunc:
            if term:
                terminations += 1
            obs = env.reset()[0]
        if i % steps == 0:
            obs = env.reset()[0]
    cte_avg = sum(cte) / len(cte)
    he_avg = sum(he) / len(he)
    return {
        "cte_avg": cte_avg,
        "cte_var": sum((x - cte_avg) ** 2 for x in cte) / len(cte),
        "heading_error_avg": he_avg,
        "heading_error_var": sum((x - he_avg) ** 2 for x in he) / len(he),
        "terminations": terminations,
        "total_reward": total_rew,
    }


def main():
    steps = _arg("--steps", 500)
    episodes = _arg("--episodes", 4)
    stroke = "exact" if "--stroke-exact" in sys.argv else (
        sys.argv[sys.argv.index("--stroke") + 1]
        if "--stroke" in sys.argv else "fast"
    )
    from tinycarlo_tpu.models import load_pretrained

    variables = load_pretrained((3, 128, 160))
    assert variables is not None, "bundled pretrained combo missing"
    rows = []
    for maneuver in range(3):
        ours = our_eval(variables, maneuver, steps, episodes, stroke=stroke)
        ref = reference_eval(variables, maneuver, steps, episodes)
        rows.append({"maneuver": maneuver, "ours": ours, "reference": ref})
        print(json.dumps(rows[-1]), flush=True)
    # headline: relative cte_avg gap across renderers
    if rows[0]["reference"] is not None:
        gaps = [
            abs(r["ours"]["cte_avg"] - r["reference"]["cte_avg"])
            / max(r["reference"]["cte_avg"], 1e-9)
            for r in rows
        ]
        print(json.dumps({
            "metric": "policy-level renderer parity: per-maneuver "
                      "|cte_avg ours - cv2| / cv2",
            "stroke": stroke,
            "gaps": [round(g, 3) for g in gaps],
        }))


if __name__ == "__main__":
    main()
