"""Policy/critic networks (flax). See tinycar_net for the model family."""
from tinycarlo_tpu.models.tinycar_net import (  # noqa: F401
    DEFAULT_A_DIM,
    DEFAULT_M_DIM,
    FEATURE_VEC_SIZE,
    TinycarActor,
    TinycarActorTemporal,
    TinycarCombo,
    TinycarCritic,
    TinycarCriticTemporal,
    TinycarEncoder,
    load_pretrained,
    load_torch_state_dict,
    model_urls,
    pre_obs,
)
