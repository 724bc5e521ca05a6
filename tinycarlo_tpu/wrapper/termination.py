"""Gymnasium termination wrappers, drop-in compatible with the reference
(reference: tinycarlo/wrapper/termination.py). Jitted batched equivalents
live in `tinycarlo_tpu.wrapper.functional`.
"""
from typing import List, Union

from gymnasium import Env, Wrapper


class LanelineCrossingTerminationWrapper(Wrapper):
    """Terminate when a named laneline distance <= track_width/2.
    Reference: wrapper/termination.py:4-22."""

    def __init__(self, env, lanelines: Union[List[str], str]):
        super().__init__(env)
        self.unwrapped.wrapped = True
        self.lanelines = lanelines if isinstance(lanelines, list) else [lanelines]

    def step(self, action):
        observation, reward, terminated, truncated, info = self.env.step(action)
        tw = self.unwrapped.car.track_width
        for name in self.lanelines:
            if info["laneline_distances"][name] <= tw / 2:
                terminated = True
        return observation, reward, terminated, truncated, info


class CTETerminationWrapper(Wrapper):
    """Terminate after N consecutive steps with |cte| > max_cte; the counter
    resets on success or on firing. Reference: wrapper/termination.py:24-48."""

    def __init__(self, env, max_cte: float, number_of_steps: int = 1):
        super().__init__(env)
        self.unwrapped.wrapped = True
        self.max_cte = max_cte
        self.number_of_steps = number_of_steps
        self.steps_true = 0

    def step(self, action):
        observation, reward, terminated, truncated, info = self.env.step(action)
        if abs(info["cte"]) > self.max_cte:
            self.steps_true += 1
            if self.steps_true >= self.number_of_steps:
                terminated = True
                self.steps_true = 0
        else:
            self.steps_true = 0
        return observation, reward, terminated, truncated, info


class CrashTerminationWrapper(Wrapper):
    """Terminate after N consecutive steps with |velocity| below threshold
    (stall detection for real-world envs). Reference:
    wrapper/termination.py:50-70 (whose kwarg spells it `velcoity_threshold`;
    both spellings are accepted here for drop-in compatibility)."""

    def __init__(
        self,
        env: Env,
        velocity_threshold: float = 0.005,
        number_of_steps: int = 10,
        **kwargs,
    ):
        super().__init__(env)
        self.unwrapped.wrapped = True
        self.velocity_threshold = kwargs.pop(
            "velcoity_threshold", velocity_threshold
        )
        if kwargs:
            raise TypeError(f"unexpected kwargs: {sorted(kwargs)}")
        self.number_of_steps = number_of_steps
        self.steps_true = 0

    def step(self, action):
        observation, reward, terminated, truncated, info = self.env.step(action)
        if abs(info["velocity"]) < self.velocity_threshold:
            self.steps_true += 1
            if self.steps_true >= self.number_of_steps:
                terminated = True
                self.steps_true = 0
        else:
            self.steps_true = 0
        return observation, reward, terminated, truncated, info
