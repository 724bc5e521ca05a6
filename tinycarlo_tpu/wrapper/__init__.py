"""Reward/termination/observation shaping.

Two surfaces over the same math:
  * Gymnasium drop-in classes (same names/signatures as the reference
    tinycarlo/wrapper/__init__.py exports) for single-env workflows;
  * pure functions + `WrapperStack` in `tinycarlo_tpu.wrapper.functional`
    that fuse into the jitted batched env (`tinycarlo_tpu.vector`).
"""
from tinycarlo_tpu.wrapper.reward import (  # noqa: F401
    CTELinearRewardWrapper,
    CTESparseRewardWrapper,
    LanelineLinearRewardWrapper,
    LanelineSparseRewardWrapper,
)
from tinycarlo_tpu.wrapper.termination import (  # noqa: F401
    CrashTerminationWrapper,
    CTETerminationWrapper,
    LanelineCrossingTerminationWrapper,
)
from tinycarlo_tpu.wrapper.observation import (  # noqa: F401
    NoiseObservationWrapper,
)
from tinycarlo_tpu.wrapper.functional import (  # noqa: F401
    WrapperStack,
    add_blob_noise_classes,
    cte_linear_reward,
    cte_sparse_reward,
    cte_termination,
    crash_termination,
    laneline_crossing_termination,
    laneline_linear_reward,
    laneline_sparse_reward,
    linear_reward,
)
