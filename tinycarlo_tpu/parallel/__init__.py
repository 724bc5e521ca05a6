"""Scale-out: device meshes, DP env sharding, TP params, SP rasterization.

Explicit strategy accounting vs the reference (SURVEY.md §2.5): the
reference has none of DP/TP/PP/SP/EP. Here DP = env-batch sharding over
the `data` axis (`mesh.shard_batch`), TP = megatron column/row sharding of
the learner MLPs over `model` (`tp.shard_params`), SP = segment-axis
sharded rasterization (`sp.rasterize_masks_sp`). PP and EP remain explicit
non-goals at tinycar_net scale: the deepest network is a 5-block convnet
(nothing to pipeline across stages) and there are no experts to route.
"""
from tinycarlo_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from tinycarlo_tpu.parallel.sp import rasterize_masks_sp  # noqa: F401
from tinycarlo_tpu.parallel.tp import shard_params, tp_plan  # noqa: F401
