"""Stanley lateral controller + Ornstein-Uhlenbeck noise, as pure jnp.

The reference computes these per step in host Python (reference:
examples/train_stanley_il.py:62-66, examples/stanley_control.py:52-63,
train_td3.py:105 OU noise at :143). Here both are batched pure functions
so the expert policy runs inside the jitted rollout.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def stanley_steering(
    cte: jnp.ndarray,
    heading_error: jnp.ndarray,
    speed: float,
    k: float,
    max_steering_angle: float,
) -> jnp.ndarray:
    """Normalized steering command in [-1, 1]-ish units (pre-clip).

    steering = (heading_error + atan2(K*cte, speed)) * 180/pi / max_angle
    Reference: train_stanley_il.py:62-65 (K=5), stanley_control.py:55-57 (K=4).
    """
    correction = jnp.arctan2(k * cte, speed)
    return (heading_error + correction) * 180.0 / math.pi / max_steering_angle


def ou_step(
    noise: jnp.ndarray,
    key: jnp.ndarray,
    theta: float = 0.1,
    mean: float = 0.0,
    sigma: float = 0.4,
) -> jnp.ndarray:
    """One Ornstein-Uhlenbeck step: n += theta*(mean-n) + sigma*N(0,1).

    Reference: train_td3.py:105 (get_action), train_stanley_il.py:66.
    `noise` may carry any batch shape.
    """
    return (
        noise
        + theta * (mean - noise)
        + sigma * jax.random.normal(key, noise.shape, noise.dtype)
    )
