"""Real-world bridge: run the map/reward machinery as a digital twin
around hardware cars and cameras. See `base` for the backend contract,
`env` for the Gymnasium env, `tracking` for UDP pose ingestion."""
from tinycarlo_tpu.real_world.base import (  # noqa: F401
    RealWorldCamera,
    RealWorldCar,
    pose_reset,
    pose_step,
    snap_to_lanepath,
)
from tinycarlo_tpu.real_world.env import (  # noqa: F401
    TinyCarloRealWorldEnv,
    register_backend,
)
from tinycarlo_tpu.real_world.tracking import PoseTracker  # noqa: F401
