"""tinycarlo_tpu: a TPU-native 2D self-driving-car simulation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference `tinycarlo` package (a Gymnasium env around a kinematic bicycle
car, polyline maps, a projective line camera, reward/termination wrappers,
and TD3/imitation-learning training examples). The simulation core is a
pair of pure functions over pytrees -- `reset` / `step` -- that jit, vmap
over thousands of cars, and shard over TPU meshes; the Gymnasium class API
is a thin host-side shim on top.

Public surface:
  * tinycarlo_tpu.env        -- functional core (EnvParams/EnvState, reset, step)
  * tinycarlo_tpu.gym_env    -- Gymnasium-compatible TinyCarloEnv ("tinycarlo-v2")
  * tinycarlo_tpu.vector     -- batched auto-resetting env (vmap / shard_map)
  * tinycarlo_tpu.wrapper    -- reward/termination/observation shaping
  * tinycarlo_tpu.models     -- flax policy/critic networks (tinycar_net family)
  * tinycarlo_tpu.train      -- TD3 / imitation learning / evaluation on-device
"""

__version__ = "2.0.0"

from tinycarlo_tpu.config import (  # noqa: F401
    CameraConfig,
    CarConfig,
    EnvConfig,
    MapConfig,
    SimConfig,
    load_config,
)
from tinycarlo_tpu.env import (  # noqa: F401
    EnvParams,
    EnvState,
    make_env_params,
    render_observation,
    render_observation_batch,
    reset,
    step,
)
from tinycarlo_tpu import vector  # noqa: F401

# Gymnasium registration mirrors the reference ids (reference:
# tinycarlo/__init__.py:3-4) so `gym.make("tinycarlo-v2", ...)` resolves to
# this framework when it is the installed `tinycarlo` implementation.
try:  # gymnasium is an optional host-side dependency of the core
    from gymnasium.envs.registration import register, registry

    for _id, _entry in (
        ("tinycarlo-v2", "tinycarlo_tpu.gym_env:TinyCarloEnv"),
        ("tinycarlo-realworld-v2", "tinycarlo_tpu.real_world.env:TinyCarloRealWorldEnv"),
    ):
        if _id not in registry:
            register(id=_id, entry_point=_entry)
except ImportError:  # pragma: no cover
    pass
