"""Fused TD3 actor-learner: rollout + replay + updates in ONE jitted scan.

The reference interleaves env stepping, encoder inference, replay writes,
and torch updates across the host/GPU boundary every step (reference:
examples/train_td3.py:174-207, device copies at :176,197 and
rl_utils.py:27). Here a whole training chunk -- B parallel envs stepped T
times, features encoded, OU exploration, replay insertion, and one TD3
update per env-step -- is a single XLA program over device-resident state;
the host only orchestrates chunks and logging.

Semantics kept from the reference loop:
  * frozen encoder features feed a (seq_len+1) feature queue that is
    rolled, never cleared, across episode boundaries (train_td3.py:164,
    175-176,196-197);
  * replay rows are (queue[1:], m, a, r, queue[:-1]) (train_td3.py:198);
  * OU noise resets and a fresh random maneuver in {0,1,2} is drawn when
    an episode ends (train_td3.py:175-179), and maneuver 2 is remapped to
    3 at the env boundary (train_td3.py:188);
  * updates start once the buffer holds a full batch (train_td3.py:201).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tinycarlo_tpu import env as fenv
from tinycarlo_tpu import vector
from tinycarlo_tpu.models.tinycar_net import FEATURE_VEC_SIZE
from tinycarlo_tpu.train import replay as rb
from tinycarlo_tpu.train import td3
from tinycarlo_tpu.train.stanley import ou_step
from tinycarlo_tpu.wrapper.functional import WrapperStack


@struct.dataclass
class LoopConfig:
    """Rollout-side knobs; defaults mirror train_td3.py:25-48."""

    speed: float = struct.field(pytree_node=False, default=0.4)
    steering_shift: float = struct.field(pytree_node=False, default=0.0)
    max_episode_steps: int = struct.field(pytree_node=False, default=1000)
    replay_size: int = struct.field(pytree_node=False, default=500_000)
    updates_per_step: int = struct.field(pytree_node=False, default=1)
    # Observation dtype fed to the frozen encoder. None = the env's uint8
    # contract (obs -> pre_obs /255). A float dtype (classes format only)
    # makes the rasterizer emit 0/1 masks directly -- the obs never leaves
    # the graph, so the uint8 materialization + /255 convert are skipped;
    # identical encoder inputs (0/1 exact in bf16/f32). Ignored when the
    # wrapper stack carries observation_fns (those are uint8-domain).
    obs_dtype: Optional[Any] = struct.field(pytree_node=False, default=None)
    # Planned total episodes PER ENV for the reference's OU-sigma decay
    # NOISE_SIGMA = 0.4 * (1 - episode_number / EPISODES)
    # (train_td3.py:143,179). When set, each env's sigma follows that
    # exact per-episode formula IN-GRAPH from its own episode counter
    # (clamped at 0 past the plan); the host-side `sigma_target`
    # mechanism is then unused. None keeps the host-driven level
    # (LoopState.sigma_target) for open-ended runs.
    total_episodes: Optional[int] = struct.field(
        pytree_node=False, default=None
    )


@struct.dataclass
class LoopState:
    vstate: vector.VecState
    queue: jnp.ndarray  # (B, seq_len+1, F)
    noise: jnp.ndarray  # (B, action_dim)
    maneuver: jnp.ndarray  # (B,) int32
    buf: rb.ReplayBuffer
    td3_state: td3.TD3State
    key: jnp.ndarray
    # Per-env OU sigma. Reference semantics (train_td3.py:179): sigma is
    # CONSTANT within an episode and drops to the current decay level only
    # when a new episode starts. `sigma_target` is that level -- the host
    # lowers it across the run (examples/train_td3.py); each env picks it
    # up at its own episode boundary.
    sigma: jnp.ndarray  # (B,)
    sigma_target: jnp.ndarray  # ()
    # Per-env completed-episode counter, driving the in-graph sigma
    # decay when LoopConfig.total_episodes is set.
    ep_count: jnp.ndarray  # (B,) int32


def init_loop(
    params: fenv.EnvParams,
    cfg: td3.TD3Config,
    loop_cfg: LoopConfig,
    key: jnp.ndarray,
    n_envs: int,
    stack: Optional[WrapperStack] = None,
) -> LoopState:
    k_env, k_td3, k_m, k_loop = jax.random.split(key, 4)
    vstate, _ = vector.reset(params, k_env, n_envs, stack=stack, render=False)
    example = {
        "x": jnp.zeros((cfg.seq_len, FEATURE_VEC_SIZE), jnp.float32),
        "m": jnp.zeros((), jnp.int32),
        "a": jnp.zeros((cfg.action_dim,), jnp.float32),
        "r": jnp.zeros((1,), jnp.float32),
        "x1": jnp.zeros((cfg.seq_len, FEATURE_VEC_SIZE), jnp.float32),
    }
    return LoopState(
        vstate=vstate,
        queue=jnp.zeros(
            (n_envs, cfg.seq_len + 1, FEATURE_VEC_SIZE), jnp.float32
        ),
        noise=jnp.zeros((n_envs, cfg.action_dim), jnp.float32),
        maneuver=jax.random.randint(k_m, (n_envs,), 0, 3, jnp.int32),
        buf=rb.create(loop_cfg.replay_size, example),
        td3_state=td3.create(k_td3, cfg),
        key=k_loop,
        sigma=jnp.full((n_envs,), 0.4, jnp.float32),
        sigma_target=jnp.asarray(0.4, jnp.float32),
        ep_count=jnp.zeros((n_envs,), jnp.int32),
    )


def chunk(
    state: LoopState,
    params: fenv.EnvParams,
    cfg: td3.TD3Config,
    loop_cfg: LoopConfig,
    encoder_apply,
    n_steps: int,
    stack: Optional[WrapperStack] = None,
    obs_render_fn=None,
) -> Tuple[LoopState, Dict[str, jnp.ndarray]]:
    """Run `n_steps` fused rollout+train steps. `encoder_apply(obs_uint8)
    -> (B, F) features` (typically the frozen pretrained encoder,
    train_td3.py:66-67,152-155). Jit this with everything but `state`
    closed over / static.

    `obs_render_fn(params, env_state, out_dtype) -> obs`, if given,
    replaces the float-obs observation render inside the chunk -- the
    composition point for a sharded renderer (e.g.
    `parallel.sp.render_observation_batch_sp` under a device mesh makes
    the WHOLE training step one DP x TP x SP program). Requires
    `loop_cfg.obs_dtype` to be set (the float-obs feed).
    """
    n_envs = state.queue.shape[0]

    def body(s: LoopState, _):
        key, k_ou, k_evict, k_sample, k_m = jax.random.split(s.key, 5)

        feat_seq = s.queue[:, :-1]  # newest seq_len entries
        m_onehot = jax.nn.one_hot(s.maneuver, cfg.maneuver_dim)
        noise = ou_step(
            s.noise, k_ou, cfg.noise_theta, cfg.noise_mean, s.sigma[:, None]
        )
        action = td3.select_action(
            s.td3_state, cfg, feat_seq, m_onehot, noise,
            loop_cfg.steering_shift,
        )
        env_dtype = s.vstate.env.car.position.dtype
        env_action = {
            "car_control": jnp.stack(
                [
                    jnp.full((n_envs,), loop_cfg.speed, env_dtype),
                    action[:, 0].astype(env_dtype),
                ],
                axis=-1,
            ),
            "maneuver": jnp.where(s.maneuver != 2, s.maneuver, 3),
        }
        use_float_obs = loop_cfg.obs_dtype is not None and not (
            stack is not None and stack.observation_fns
        )
        vstate, obs, rew, term, trunc, info = vector.step(
            params,
            s.vstate,
            env_action,
            stack=stack,
            max_episode_steps=loop_cfg.max_episode_steps,
            render=not use_float_obs,
        )
        if use_float_obs:
            # obs never reaches the host: render 0/1 masks in the encoder's
            # dtype straight from the kernel (same post-auto-reset states
            # vector.step would render)
            if obs_render_fn is not None:
                obs = obs_render_fn(
                    params, vstate.env, loop_cfg.obs_dtype
                )
            else:
                obs = fenv.render_observation_batch(
                    params, vstate.env, out_dtype=loop_cfg.obs_dtype
                )
        f = encoder_apply(obs).astype(s.queue.dtype)
        queue = jnp.roll(s.queue, 1, axis=1).at[:, 0].set(f)
        buf = rb.add_batch(
            s.buf,
            k_evict,
            {
                "x": queue[:, 1:],
                "m": s.maneuver,
                "a": action,
                "r": rew[:, None].astype(jnp.float32),
                "x1": queue[:, :-1],
            },
        )

        def do_update(td3_state):
            # `updates_per_step` gradient steps per env-step (the reference
            # does exactly one per single-env step, train_td3.py:201-203;
            # at B parallel envs this knob restores the update:data ratio)
            def upd(ts, k):
                batch = rb.sample(buf, k, cfg.batch_size)
                batch["m"] = jax.nn.one_hot(batch["m"], cfg.maneuver_dim)
                batch["m1"] = batch["m"]
                return td3.train_step(ts, cfg, batch)

            losses = None
            for i, k in enumerate(
                jax.random.split(k_sample, loop_cfg.updates_per_step)
            ):
                td3_state, losses = upd(td3_state, k)
            return td3_state, losses

        def skip(td3_state):
            z = jnp.zeros((), jnp.float32)
            return td3_state, {
                "critic1_loss": z,
                "critic2_loss": z,
                "actor_loss": z,
            }

        if loop_cfg.updates_per_step > 0:
            td3_state, losses = jax.lax.cond(
                buf.filled >= cfg.batch_size, do_update, skip, s.td3_state
            )
        else:  # rollout-only collection (e.g. --updates 0)
            td3_state, losses = skip(s.td3_state)

        done = term | trunc
        noise = jnp.where(done[:, None], 0.0, noise)
        ep_count = s.ep_count + done.astype(jnp.int32)
        if loop_cfg.total_episodes is not None:
            # episode boundary: the reference's exact per-episode decay
            # NOISE_SIGMA = 0.4 * (1 - episode_number / EPISODES)
            # (train_td3.py:179), per env from its own episode counter
            level = 0.4 * jnp.maximum(
                0.0, 1.0 - ep_count.astype(jnp.float32)
                / loop_cfg.total_episodes,
            )
        else:
            # host-driven decay level (open-ended runs)
            level = jnp.broadcast_to(s.sigma_target, ep_count.shape)
        # sigma never changes mid-episode (train_td3.py:179)
        sigma = jnp.where(done, level, s.sigma)
        maneuver = jnp.where(
            done, jax.random.randint(k_m, (n_envs,), 0, 3, jnp.int32), s.maneuver
        )
        out = {
            "reward": rew,
            "done": done,
            "sigma": sigma,
            "cte": info["cte"],
            # batch-mean per-laneline distances: the batched analogue of
            # the reference's per-step distance logging (vis_utils.py)
            "laneline_distances": jnp.mean(
                info["laneline_distances"], axis=0
            ),
            **losses,
        }
        s = s.replace(
            vstate=vstate,
            queue=queue,
            noise=noise,
            maneuver=maneuver,
            buf=buf,
            td3_state=td3_state,
            key=key,
            sigma=sigma,
            ep_count=ep_count,
        )
        return s, out

    return jax.lax.scan(body, state, None, length=n_steps)
