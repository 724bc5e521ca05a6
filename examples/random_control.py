"""Minimal Gymnasium loop with random actions.

Equivalent of the reference's examples/random_control.py:5-16.
Usage: python examples/random_control.py [--render]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import sys

import gymnasium as gym

import tinycarlo_tpu  # noqa: F401  (registers tinycarlo-v2)
from examples._common import default_config

if __name__ == "__main__":
    render_mode = "human" if "--render" in sys.argv else None
    env = gym.make("tinycarlo-v2", config=default_config(), render_mode=render_mode)
    observation, info = env.reset(seed=2)
    for _ in range(1000):
        observation, reward, terminated, truncated, info = env.step(
            env.action_space.sample()
        )
        if terminated or truncated:
            observation, info = env.reset()
    env.close()
    print("done")
