"""Gymnasium observation-noise wrapper, drop-in compatible with the
reference (reference: tinycarlo/wrapper/observation.py). The noise itself
runs on-device via `tinycarlo_tpu.wrapper.functional.add_blob_noise_classes`
so the same transform is usable inside a jitted batched rollout.
"""
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import Wrapper

from tinycarlo_tpu.wrapper.functional import add_blob_noise_classes


class NoiseObservationWrapper(Wrapper):
    """Random blob noise on "classes" observations: per channel, discs are
    either erased or OR-ed in from a random other channel (p=0.3).
    Reference: wrapper/observation.py:5-33."""

    def __init__(self, env, blob_max_radius: int = 100, n_blobs: int = 10):
        super().__init__(env)
        self.unwrapped.wrapped = True
        self.max_radius = blob_max_radius
        self.n_blobs = n_blobs
        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._noise_fn = jax.jit(
            lambda key, obs: add_blob_noise_classes(
                key, obs, self.max_radius, self.n_blobs
            )
        )

    def add_blob_noise_classes(self, observation: np.ndarray) -> np.ndarray:
        self._key, sub = jax.random.split(self._key)
        return np.asarray(self._noise_fn(sub, jnp.asarray(observation)))

    def step(self, action):
        observation, reward, terminated, truncated, info = self.env.step(action)
        if (
            self.env.unwrapped.observation_space_format == "classes"
            and not self.env.unwrapped.no_observation
        ):
            observation = self.add_blob_noise_classes(observation)
        return observation, reward, terminated, truncated, info
