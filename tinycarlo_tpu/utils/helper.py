"""Small scalar/angle helpers shared across the framework.

Semantics mirror the reference helpers (reference: tinycarlo/helper.py:4-24),
re-expressed as jax-traceable, batched tensor ops.
"""
from __future__ import annotations

import math
import os

import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def getenv(key: str) -> bool:
    """True iff the environment variable is set to "1".

    Reference: tinycarlo/helper.py:4-9.
    """
    v = os.environ.get(key)
    return v is not None and v.lower() == "1"


def clip_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to the [-pi, pi] interval.

    The reference (tinycarlo/helper.py:11-19) uses sequential while-loops:
    values entering above pi land in (-pi, pi]; values entering below -pi
    land in [-pi, pi); values already inside are untouched (so both +pi and
    -pi are fixed points). We replicate that exactly for bounded inputs by
    unrolling two conditional corrections per direction, which is exact for
    |a| <= 5*pi -- far beyond anything the simulation produces (worst case is
    an edge orientation in [-pi, pi] plus a maneuver offset of 3*pi/2).
    Sequential conditional subtraction keeps bit-exact float parity with the
    reference's loop, unlike a fused modulo.
    """
    a = jnp.asarray(a)
    for _ in range(2):
        a = jnp.where(a > math.pi, a - TWO_PI, a)
    for _ in range(2):
        a = jnp.where(a < -math.pi, a + TWO_PI, a)
    return a


def angle(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Angle of the vector (x, y) in radians. Reference: tinycarlo/helper.py:21-24."""
    return jnp.arctan2(y, x)
