"""On-device training: TD3, Stanley imitation learning, replay, evaluation."""
from tinycarlo_tpu.train import replay  # noqa: F401
from tinycarlo_tpu.train.evaluate import (  # noqa: F401
    combo_policy,
    evaluate,
    standard_stack,
    temporal_policy,
)
from tinycarlo_tpu.train.il import ILConfig, ILState  # noqa: F401
from tinycarlo_tpu.train.il import collect_dataset, randomize_camera  # noqa: F401
from tinycarlo_tpu.train.il import create as il_create  # noqa: F401
from tinycarlo_tpu.train.il import train_step as il_train_step  # noqa: F401
from tinycarlo_tpu.train.stanley import ou_step, stanley_steering  # noqa: F401
from tinycarlo_tpu.train.td3 import TD3Config, TD3State  # noqa: F401
from tinycarlo_tpu.train.td3 import create as td3_create  # noqa: F401
from tinycarlo_tpu.train.td3 import select_action  # noqa: F401
from tinycarlo_tpu.train.td3 import train_step as td3_train_step  # noqa: F401
