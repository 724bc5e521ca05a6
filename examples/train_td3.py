"""TD3 training: fused on-device rollout+replay+update chunks.

Equivalent of the reference's examples/train_td3.py, with the host loop
reduced to chunk orchestration + logging: the wrapper stack
(CTELinearReward + CTETermination + CrashTermination, train_td3.py:60-62),
frozen pretrained encoder (:66-67), temporal actor/critics over a
seq_len=10 feature queue (:164), OU exploration with per-episode sigma
decay (:143,179), optional steering shift (:37,146-147), CSV/plot
artifacts, and per-maneuver evaluation (:239-244).

Usage: python examples/train_td3.py [--envs 64] [--chunks 40] [--shift]
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

from examples._common import default_config
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.models import (
    TinycarActorTemporal,
    TinycarEncoder,
    load_pretrained,
    pre_obs,
)
from tinycarlo_tpu.train import evaluate as evaluate_fn
from tinycarlo_tpu.train import logging as tlog
from tinycarlo_tpu.train import td3
from tinycarlo_tpu.train.evaluate import standard_stack, temporal_policy
from tinycarlo_tpu.train.td3_loop import LoopConfig, chunk, init_loop

SEQ_LEN = 10
SPEED = 0.4
STEERING_SHIFT = -0.01
OUT_DIR = os.environ.get("TD3_OUT", "/tmp/td3_run")


def _arg(flag, default):
    return (
        int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default
    )


if __name__ == "__main__":
    n_envs = _arg("--envs", 64)
    n_chunks = _arg("--chunks", 40)
    chunk_steps = _arg("--steps", 100)
    include_shift = "--shift" in sys.argv

    params = fenv.make_env_params(default_config())
    cfg = td3.TD3Config(seq_len=SEQ_LEN)
    # float obs feed (classes format only): the rasterizer emits 0/1 masks
    # straight into the frozen encoder -- same values, no uint8 round trip
    classes = params.cfg.sim.observation_space_format == "classes"
    # --episodes N plans N episodes per env and runs the reference's
    # exact per-episode sigma decay in-graph (train_td3.py:143,179);
    # without it the host lowers the level once per chunk (see below).
    total_eps = _arg("--episodes", 0) or None
    loop_cfg = LoopConfig(
        speed=SPEED,
        steering_shift=STEERING_SHIFT if include_shift else 0.0,
        replay_size=100_000,
        max_episode_steps=1000,
        updates_per_step=_arg("--updates", 1),
        obs_dtype=jnp.bfloat16 if classes else None,
        total_episodes=total_eps,
    )
    stack = standard_stack()  # same shaping as train_td3.py:60-62

    # frozen encoder, in preference order: the user's own IL-trained combo
    # from examples/train_stanley_il.py (IL_MODEL, explicit user intent),
    # then load_pretrained (reference download -> package-bundled combo),
    # then fresh init.
    enc = TinycarEncoder()
    obs_shape = fenv.observation_shape(params)
    pretrained = None
    il_model = os.environ.get("IL_MODEL", "/tmp/tinycar_combo_flax.npz")
    if os.path.exists(il_model):
        from tinycarlo_tpu.train.il import load_variables_npz

        pretrained = load_variables_npz(il_model)
        print(f"loaded IL-trained combo from {il_model}")
    if pretrained is None:
        pretrained = load_pretrained(tuple(obs_shape))
        if pretrained is not None:
            print("loaded pretrained encoder")
    if pretrained is not None:
        enc_vars = {
            "params": pretrained["params"]["encoder"],
            "batch_stats": pretrained["batch_stats"]["encoder"],
        }
    else:
        enc_vars = enc.init(
            jax.random.key(1), pre_obs(jnp.zeros((1, *obs_shape), jnp.uint8))
        )

    def encoder_apply(obs):
        return enc.apply(enc_vars, pre_obs(obs))

    state = init_loop(params, cfg, loop_cfg, jax.random.key(0), n_envs, stack)
    # NOTE: donate_argnums=(0,) here would avoid XLA's per-chunk-entry
    # copies of the replay buffers, but donation raises InvalidArgument
    # through the tunneled (axon) TPU backend; enable it on
    # directly-attached devices.
    run = jax.jit(
        partial(
            chunk,
            params=params,
            cfg=cfg,
            loop_cfg=loop_cfg,
            encoder_apply=encoder_apply,
            n_steps=chunk_steps,
            stack=stack,
        )
    )

    c1_hist, c2_hist, a_hist, rew_hist = [], [], [], []
    cte_hist, dist_hist = [], []
    # per-net weight snapshots every chunk: the batched analogue of the
    # reference's every-200-steps tracking (train_td3.py:151-158)
    w_hist = {"actor": {}, "critic1": {}, "critic2": {}}

    def snapshot_weights(step):
        tlog.snapshot_params(state.td3_state.actor, step, w_hist["actor"])
        tlog.snapshot_params(state.td3_state.critic1, step, w_hist["critic1"])
        tlog.snapshot_params(state.td3_state.critic2, step, w_hist["critic2"])

    snapshot_weights(0)
    # Pipelined dispatch (default): chunk i+1 is dispatched BEFORE chunk
    # i's logs are fetched, so the host's device_get / weight snapshots /
    # printing overlap the device executing the next chunk and the
    # ~16 ms tunnel dispatch cost hides under execution
    # (benchmarks/baseline_configs.py config 4 measured 75.4k -> 88.1k
    # at 64 envs from this alone; the reference's loop blocks on every
    # step, train_td3.py:174-207). --sync restores blocking dispatch.
    pipelined = "--sync" not in sys.argv
    timer = {"st": time.perf_counter()}

    def consume(pending):
        """Fetch + log one finished chunk (runs while the next executes)."""
        i, out, td3_st, filled = pending
        out = jax.device_get(out)
        c1_hist.extend(out["critic1_loss"])
        c2_hist.extend(out["critic2_loss"])
        a_hist.extend(x for x in out["actor_loss"] if x != 0.0)
        rew_hist.append(float(out["reward"].sum() / max(1, out["done"].sum())))
        cte_hist.extend(out["cte"].mean(axis=-1))
        dist_hist.extend(out["laneline_distances"])
        tlog.snapshot_params(td3_st.actor, (i + 1) * chunk_steps,
                             w_hist["actor"])
        tlog.snapshot_params(td3_st.critic1, (i + 1) * chunk_steps,
                             w_hist["critic1"])
        tlog.snapshot_params(td3_st.critic2, (i + 1) * chunk_steps,
                             w_hist["critic2"])
        now = time.perf_counter()
        sps = chunk_steps * n_envs / (now - timer["st"])  # this chunk only,
        timer["st"] = now  # so compile time doesn't drown the steady rate
        print(
            f"chunk {i+1}/{n_chunks} | {sps:,.0f} env-steps/s | "
            f"c1 {tlog.avg_w(c1_hist):.3f} | rew/ep {rew_hist[-1]:.2f} | "
            f"buffer {int(filled)}"
        )

    pending = None
    for i in range(n_chunks):
        if total_eps is None:
            # linear decay of the OU sigma level across the run; each env
            # adopts it at its own episode boundary, so sigma stays
            # constant within episodes like the reference
            # (train_td3.py:179). With --episodes the exact per-episode
            # formula runs in-graph instead (LoopConfig.total_episodes).
            state = state.replace(
                sigma_target=jnp.asarray(
                    0.4 * (1 - i / n_chunks), jnp.float32
                )
            )
        state, out = run(state)  # async dispatch of chunk i
        if pending is not None:
            consume(pending)  # overlaps chunk i's device execution
        pending = (i, out, state.td3_state, state.buf.filled)
        if not pipelined:
            consume(pending)
            pending = None
    if pending is not None:
        consume(pending)

    sfx = "with_shift" if include_shift else "without_shift"
    tlog.save_losses(OUT_DIR, c1_hist, c2_hist, a_hist, sfx)
    tlog.save_rewards(OUT_DIR, rew_hist, sfx)
    tlog.save_series(OUT_DIR, "cte", cte_hist, sfx)
    import numpy as _np
    if dist_hist:
        dist = _np.asarray(dist_hist)  # (steps, L)
        for li, lname in enumerate(params.map_data.laneline_names):
            tlog.save_series(OUT_DIR, lname, dist[:, li], sfx)
    for net in ("actor", "critic1", "critic2"):
        tlog.save_weight_changes(
            OUT_DIR, net, tlog.weight_changes(w_hist[net]),
            step_interval=chunk_steps, suffix=sfx,
        )
    tlog.plot_series(os.path.join(OUT_DIR, "critic_loss.png"),
                     {"critic1": c1_hist, "critic2": c2_hist})
    print(f"artifacts in {OUT_DIR}")

    print("Evaluating:")
    actor = TinycarActorTemporal(seq_len=SEQ_LEN)
    pol = temporal_policy(enc, enc_vars, actor, state.td3_state.actor, SEQ_LEN)
    for maneuver in range(3):
        r = evaluate_fn(
            pol, params, maneuver=maneuver,
            carry_init=jnp.zeros((5, SEQ_LEN, 256)), steps=1000, episodes=5,
        )
        print(
            f"Maneuver {maneuver} -> Total reward: {r['total_reward']:.2f} | "
            f"CTE: {r['cte_avg']:.4f} m/step var: {r['cte_var']:.4f} | "
            f"Heading Error: {r['heading_error_avg']:.4f} rad/step var "
            f"{r['heading_error_var']:.4f} | Terminations: {r['terminations']:3d} "
            f"| perf: {r['steps_per_s']:.2f} steps/s"
        )
