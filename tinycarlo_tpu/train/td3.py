"""TD3 (twin delayed DDPG) on-device: jitted update steps over optax.

Faithful to the reference trainer's math (reference: examples/train_td3.py:
105-138): twin critics with min-target, `target_q = min(Q1',Q2')*gamma + r`
(the reference applies no terminal mask -- replicated as-is), MSE critic
losses, delayed actor update maximizing critic1, and tau soft updates of
all three targets performed inside the actor update. The torch
device-copy boundary (train_td3.py:176,197) disappears: batches come
straight from the on-device replay buffer.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tinycarlo_tpu.models.tinycar_net import (
    DEFAULT_A_DIM,
    DEFAULT_M_DIM,
    FEATURE_VEC_SIZE,
    TinycarActor,
    TinycarActorTemporal,
    TinycarCritic,
    TinycarCriticTemporal,
)


@struct.dataclass
class TD3Config:
    """Hyperparameters; defaults mirror reference train_td3.py:25-34,41-46."""

    batch_size: int = struct.field(pytree_node=False, default=256)
    discount_factor: float = struct.field(pytree_node=False, default=0.99)
    tau: float = struct.field(pytree_node=False, default=0.001)
    policy_delay: int = struct.field(pytree_node=False, default=2)
    lr_actor: float = struct.field(pytree_node=False, default=1e-4)
    lr_critic: float = struct.field(pytree_node=False, default=2e-4)
    noise_theta: float = struct.field(pytree_node=False, default=0.1)
    noise_mean: float = struct.field(pytree_node=False, default=0.0)
    noise_sigma: float = struct.field(pytree_node=False, default=0.4)
    seq_len: int = struct.field(pytree_node=False, default=10)
    maneuver_dim: int = struct.field(pytree_node=False, default=DEFAULT_M_DIM)
    action_dim: int = struct.field(pytree_node=False, default=DEFAULT_A_DIM)
    temporal: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class TD3State:
    actor: Any
    actor_target: Any
    critic1: Any
    critic2: Any
    critic1_target: Any
    critic2_target: Any
    opt_actor: Any
    opt_critic1: Any
    opt_critic2: Any
    steps: jnp.ndarray  # () int32 update counter (drives policy delay)


def _nets(cfg: TD3Config):
    if cfg.temporal:
        actor = TinycarActorTemporal(
            maneuver_dim=cfg.maneuver_dim,
            action_dim=cfg.action_dim,
            seq_len=cfg.seq_len,
        )
        critic = TinycarCriticTemporal(
            maneuver_dim=cfg.maneuver_dim,
            action_dim=cfg.action_dim,
            seq_len=cfg.seq_len,
        )
    else:
        actor = TinycarActor(
            maneuver_dim=cfg.maneuver_dim, action_dim=cfg.action_dim
        )
        critic = TinycarCritic(
            maneuver_dim=cfg.maneuver_dim, action_dim=cfg.action_dim
        )
    return actor, critic


def _feat_shape(cfg: TD3Config) -> Tuple[int, ...]:
    if cfg.temporal:
        return (1, cfg.seq_len, FEATURE_VEC_SIZE)
    return (1, FEATURE_VEC_SIZE)


def create(key: jnp.ndarray, cfg: TD3Config) -> TD3State:
    """Init actor/critics; targets start as copies (train_td3.py:87-92)."""
    actor, critic = _nets(cfg)
    kf = jnp.zeros(_feat_shape(cfg), jnp.float32)
    km = jnp.zeros((1, cfg.maneuver_dim), jnp.float32)
    ka = jnp.zeros((1, cfg.action_dim), jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    actor_params = actor.init(k1, kf, km)["params"]
    critic1_params = critic.init(k2, kf, km, ka)["params"]
    critic2_params = critic.init(k3, kf, km, ka)["params"]
    tx_a = optax.adam(cfg.lr_actor)
    tx_c = optax.adam(cfg.lr_critic)
    return TD3State(
        actor=actor_params,
        actor_target=actor_params,
        critic1=critic1_params,
        critic2=critic2_params,
        critic1_target=critic1_params,
        critic2_target=critic2_params,
        opt_actor=tx_a.init(actor_params),
        opt_critic1=tx_c.init(critic1_params),
        opt_critic2=tx_c.init(critic2_params),
        steps=jnp.zeros((), jnp.int32),
    )


def apply_actor(cfg: TD3Config, params, f, m):
    actor, _ = _nets(cfg)
    return actor.apply({"params": params}, f, m)


def apply_critic(cfg: TD3Config, params, f, m, a):
    _, critic = _nets(cfg)
    return critic.apply({"params": params}, f, m, a)


def critic_update(
    state: TD3State, cfg: TD3Config, batch: Dict[str, jnp.ndarray]
) -> Tuple[TD3State, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Twin-critic regression to the min target (train_td3.py:105-124).
    batch keys: x, m (one-hot), a, r, x1, m1."""
    target_action = apply_actor(cfg, state.actor_target, batch["x1"], batch["m1"])
    tq1 = apply_critic(
        cfg, state.critic1_target, batch["x1"], batch["m1"], target_action
    )
    tq2 = apply_critic(
        cfg, state.critic2_target, batch["x1"], batch["m1"], target_action
    )
    target_q = jnp.minimum(tq1, tq2) * cfg.discount_factor + batch["r"]
    target_q = jax.lax.stop_gradient(target_q)

    def loss_fn(params):
        q = apply_critic(cfg, params, batch["x"], batch["m"], batch["a"])
        return jnp.mean((target_q - q) ** 2)

    tx = optax.adam(cfg.lr_critic)
    l1, g1 = jax.value_and_grad(loss_fn)(state.critic1)
    u1, opt1 = tx.update(g1, state.opt_critic1, state.critic1)
    l2, g2 = jax.value_and_grad(loss_fn)(state.critic2)
    u2, opt2 = tx.update(g2, state.opt_critic2, state.critic2)
    state = state.replace(
        critic1=optax.apply_updates(state.critic1, u1),
        critic2=optax.apply_updates(state.critic2, u2),
        opt_critic1=opt1,
        opt_critic2=opt2,
    )
    return state, (l1, l2)


def _soft(cfg: TD3Config, online, target):
    return jax.tree.map(
        lambda v, vt: cfg.tau * v + (1.0 - cfg.tau) * vt, online, target
    )


def actor_update(
    state: TD3State, cfg: TD3Config, batch: Dict[str, jnp.ndarray]
) -> Tuple[TD3State, jnp.ndarray]:
    """Deterministic-policy-gradient step + tau soft updates of all targets
    (train_td3.py:126-138 -- targets only move on actor updates)."""

    def loss_fn(params):
        a = apply_actor(cfg, params, batch["x"], batch["m"])
        return -jnp.mean(
            apply_critic(cfg, state.critic1, batch["x"], batch["m"], a)
        )

    tx = optax.adam(cfg.lr_actor)
    loss, grads = jax.value_and_grad(loss_fn)(state.actor)
    updates, opt = tx.update(grads, state.opt_actor, state.actor)
    actor = optax.apply_updates(state.actor, updates)
    state = state.replace(
        actor=actor,
        opt_actor=opt,
        actor_target=_soft(cfg, actor, state.actor_target),
        critic1_target=_soft(cfg, state.critic1, state.critic1_target),
        critic2_target=_soft(cfg, state.critic2, state.critic2_target),
    )
    return state, loss


def train_step(
    state: TD3State, cfg: TD3Config, batch: Dict[str, jnp.ndarray]
):
    """One TD3 update: critics always, actor every `policy_delay` steps
    (train_td3.py:201-207), expressed as lax.cond so the whole thing scans.
    Returns (state, {"critic1_loss","critic2_loss","actor_loss"}), with
    actor_loss = 0 on skipped steps.
    """
    state, (l1, l2) = critic_update(state, cfg, batch)
    steps = state.steps + 1

    def do_actor(s):
        s, al = actor_update(s, cfg, batch)
        return s, al.astype(l1.dtype)

    def skip(s):
        return s, jnp.zeros((), l1.dtype)

    state, a_loss = jax.lax.cond(
        steps % cfg.policy_delay == 0, do_actor, skip, state
    )
    state = state.replace(steps=steps)
    return state, {
        "critic1_loss": l1,
        "critic2_loss": l2,
        "actor_loss": a_loss,
    }


def select_action(
    state: TD3State,
    cfg: TD3Config,
    feat: jnp.ndarray,
    maneuver_onehot: jnp.ndarray,
    noise: jnp.ndarray,
    steering_shift: float = 0.0,
) -> jnp.ndarray:
    """Exploration action: actor output + OU noise (+ optional constant
    steering shift, the domain-randomization experiment train_td3.py:37,
    146-147), clamped to [-1, 1] (train_td3.py:140-150)."""
    action = apply_actor(cfg, state.actor, feat, maneuver_onehot)
    return jnp.clip(action + noise + steering_shift, -1.0, 1.0)
