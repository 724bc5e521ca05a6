"""The tinycar_net model family in flax, re-designed TPU-first.

Same architectures/capacities as the reference PyTorch nets (reference:
examples/models/tinycar_net.py): a 5-block strided-conv encoder to a
256-d feature vector, maneuver-conditioned actor/critic MLPs, and
dilated-Conv1d temporal variants. TPU-native differences:

  * NHWC layout (the MXU-native conv layout) instead of torch NCHW;
    `pre_obs` moves env observations (C,H,W or H,W,C uint8) into model
    space, matching the reference's obs/255 float conversion
    (examples/benchmark_tinycar_net.py:20-21).
  * optional bfloat16 compute (`dtype=jnp.bfloat16`) with float32 params.
  * BatchNorm carries explicit `batch_stats` collections (pure functions,
    no module mutation).

`load_torch_state_dict` imports the reference's pretrained torch
checkpoints (examples/models/tinycar_net.py:9-13,113-129) into flax
params, so the pretrained-combo workflow works without torch at runtime.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

FEATURE_VEC_SIZE = 256  # reference TinycarEncoder.FEATURE_VEC_SIZE
DEFAULT_M_DIM = 3
DEFAULT_A_DIM = 1

# reference model_urls (examples/models/tinycar_net.py:9-13); downloads are
# attempted only when the file is absent and networking is available.
model_urls: Dict[Tuple[int, int, int], str] = {
    (5, 64, 160): "http://riege.com.de/tinycarlo/tinycar_combo_5_64_160.pt",
    (5, 128, 160): "http://riege.com.de/tinycarlo/tinycar_combo_5_128_160.pt",
    (3, 128, 160): "http://riege.com.de/tinycarlo/tinycar_combo_3_128_160.pt",
}


def pre_obs(obs: jnp.ndarray) -> jnp.ndarray:
    """Env observation -> float NHWC in [0,1].

    Accepts (..., C, H, W) "classes" or (..., H, W, 3) "rgb" layouts (the
    env's two formats, reference env.py:68-73). uint8 input gets the
    reference's obs/255 scaling (benchmark_tinycar_net.py:20-21); float
    input (the kernel's direct 0/1 masks, rasterize_env_idx out_dtype) is
    already scaled and only needs the layout move.
    """
    if obs.dtype == jnp.uint8:
        x = obs.astype(jnp.float32) / 255.0
    else:
        x = obs
    if x.shape[-1] not in (1, 3):  # (..., C, H, W) -> (..., H, W, C)
        x = jnp.moveaxis(x, -3, -1)
    return x


def pre_obs_rank(obs: jnp.ndarray, n_layers: int) -> jnp.ndarray:
    """(..., H, W) uint8 rank observation -> float NHWC one-hot in {0,1}.

    In-graph decode for the "rank" observation contract
    (env.observation_shape): channel l is 1 where layer l is the
    last-painted layer at that pixel -- the classes feed up to paint
    order (reference renderer.py:41-43), produced from 1/L of the
    observation bytes. Fuses the decode with the /255 scaling step
    (benchmark_tinycar_net.py:20-21): the one-hot IS the scaled mask.
    """
    ids = jnp.arange(1, n_layers + 1, dtype=obs.dtype)
    return (obs[..., None] == ids).astype(jnp.float32)


class ConvBlock(nn.Module):
    """Conv3x3 stride 2 + BN + ReLU. Reference: tinycar_net.py:18-25."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype
        )(x)
        return nn.relu(x)


class TinycarEncoder(nn.Module):
    """5 conv blocks [24,36,48,64,64] + FC -> 256-d feature.
    Reference: tinycar_net.py:27-50."""

    filters: Sequence[int] = (24, 36, 48, 64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.filters:
            x = ConvBlock(f, dtype=self.dtype)(x, train=train)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(FEATURE_VEC_SIZE, dtype=self.dtype)(x)
        return nn.relu(x)


class _ManeuverTrunk(nn.Module):
    """maneuver one-hot -> 100 -> 200 -> in_features MLP shared by the
    actors. Reference: tinycar_net.py:56-58,66-68."""

    in_features: int = FEATURE_VEC_SIZE
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, m):
        # explicit reference layer names (tinycar_net.py fcm1-3): the TP
        # plan in parallel/tp.py shards fcm2 column- and fcm3 row-wise by
        # NAME, so a reorder cannot silently degrade to replicated
        m = nn.relu(nn.Dense(100, dtype=self.dtype, name="fcm1")(m))
        m = nn.relu(nn.Dense(200, dtype=self.dtype, name="fcm2")(m))
        return nn.relu(
            nn.Dense(self.in_features, dtype=self.dtype, name="fcm3")(m)
        )


class _ActorHead(nn.Module):
    """concat(feature, maneuver-embedding) -> 200->100->100->action, tanh.
    Reference: tinycar_net.py:59-71."""

    action_dim: int = DEFAULT_A_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, m):
        out = jnp.concatenate([f, m], axis=-1)
        # explicit reference layer names (tinycar_net.py fc1-4); fc1/fc2
        # are the TP column/row pair (parallel/tp.py)
        out = nn.relu(nn.Dense(200, dtype=self.dtype, name="fc1")(out))
        out = nn.relu(nn.Dense(100, dtype=self.dtype, name="fc2")(out))
        out = nn.relu(nn.Dense(100, dtype=self.dtype, name="fc3")(out))
        return nn.tanh(
            nn.Dense(self.action_dim, dtype=self.dtype, name="fc4")(out)
        )


class TinycarActor(nn.Module):
    """Reference: tinycar_net.py:52-71."""

    in_features: int = FEATURE_VEC_SIZE
    maneuver_dim: int = DEFAULT_M_DIM
    action_dim: int = DEFAULT_A_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, m):
        m = _ManeuverTrunk(self.in_features, dtype=self.dtype)(m)
        return _ActorHead(self.action_dim, dtype=self.dtype)(f, m)


class _TemporalConv(nn.Module):
    """Dilated Conv1d stack over a (B, seq_len, F) feature queue.

    The reference treats seq_len as torch Conv1d *channels*, so the
    convolution slides over the 256-long feature axis with dilations
    1/2/4 and finally averages over channels (tinycar_net.py:76-78,88-90,
    152-154,166-168). Replicated exactly: transpose to (B, F, seq) where
    flax convolves over axis 1.
    """

    channels: Sequence[int]  # (32,16,16) actor / (16,16,16) critic
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f):
        # (B, seq, F) -> (B, F, seq): feature axis becomes "length".
        x = jnp.swapaxes(f, -1, -2)
        for ch, d in zip(self.channels, (1, 2, 4)):
            x = nn.relu(
                nn.Conv(
                    ch,
                    (3,),
                    padding=((d, d),),
                    kernel_dilation=(d,),
                    dtype=self.dtype,
                )(x)
            )
        return x.mean(axis=-1)  # mean over channels -> (B, F)


class TinycarActorTemporal(nn.Module):
    """Reference: tinycar_net.py:73-98."""

    in_features: int = FEATURE_VEC_SIZE
    maneuver_dim: int = DEFAULT_M_DIM
    action_dim: int = DEFAULT_A_DIM
    seq_len: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, m):
        f = _TemporalConv((32, 16, 16), dtype=self.dtype)(f)
        m = _ManeuverTrunk(self.in_features, dtype=self.dtype)(m)
        return _ActorHead(self.action_dim, dtype=self.dtype)(f, m)


class TinycarCombo(nn.Module):
    """Encoder + actor end-to-end. Reference: tinycar_net.py:100-129."""

    maneuver_dim: int = DEFAULT_M_DIM
    action_dim: int = DEFAULT_A_DIM
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = TinycarEncoder(dtype=self.dtype)
        self.actor = TinycarActor(
            maneuver_dim=self.maneuver_dim,
            action_dim=self.action_dim,
            dtype=self.dtype,
        )

    def __call__(self, x, m, train: bool = False):
        return self.actor(self.encoder(x, train=train), m)


class TinycarCritic(nn.Module):
    """(feature, maneuver, action) -> Q. Reference: tinycar_net.py:132-145."""

    maneuver_dim: int = DEFAULT_M_DIM
    action_dim: int = DEFAULT_A_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, m, a):
        m = nn.relu(nn.Dense(FEATURE_VEC_SIZE, dtype=self.dtype, name="fcm")(m))
        a = nn.relu(nn.Dense(FEATURE_VEC_SIZE, dtype=self.dtype, name="fca")(a))
        out = jnp.concatenate([f, m, a], axis=-1)
        out = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(out))
        return nn.Dense(1, dtype=self.dtype, name="fc2")(out)


class TinycarCriticTemporal(nn.Module):
    """Reference: tinycar_net.py:147-166."""

    maneuver_dim: int = DEFAULT_M_DIM
    action_dim: int = DEFAULT_A_DIM
    seq_len: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, m, a):
        f = _TemporalConv((16, 16, 16), dtype=self.dtype)(f)
        m = nn.relu(nn.Dense(FEATURE_VEC_SIZE, dtype=self.dtype)(m))
        a = nn.relu(nn.Dense(FEATURE_VEC_SIZE, dtype=self.dtype)(a))
        out = jnp.concatenate([f, m, a], axis=-1)
        out = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(out))
        return nn.Dense(1, dtype=self.dtype, name="fc2")(out)


# ---------------------------------------------------------------------------
# Pretrained-weight import (torch checkpoint -> flax variables).
# ---------------------------------------------------------------------------

def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out,in) -> flax Dense kernel (in,out)."""
    return np.ascontiguousarray(w.T)


def _tconv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O,I,kh,kw) -> flax (kh,kw,I,O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Convert a reference TinycarCombo torch checkpoint into flax
    variables {'params': ..., 'batch_stats': ...}.

    Key mapping mirrors the reference layer names
    (examples/models/tinycar_net.py:33-38,56-71).
    """
    import torch

    sd = {
        k: v.detach().cpu().numpy()
        for k, v in torch.load(path, map_location="cpu").items()
    }
    params: Dict[str, Any] = {"encoder": {}, "actor": {}}
    stats: Dict[str, Any] = {"encoder": {}}

    for i in range(5):
        blk = f"ConvBlock_{i}"
        params["encoder"][blk] = {
            "Conv_0": {
                "kernel": _tconv(sd[f"encoder.convs.{i}.conv1.weight"]),
                "bias": sd[f"encoder.convs.{i}.conv1.bias"],
            },
            "BatchNorm_0": {
                "scale": sd[f"encoder.convs.{i}.bn1.weight"],
                "bias": sd[f"encoder.convs.{i}.bn1.bias"],
            },
        }
        stats["encoder"][blk] = {
            "BatchNorm_0": {
                "mean": sd[f"encoder.convs.{i}.bn1.running_mean"],
                "var": sd[f"encoder.convs.{i}.bn1.running_var"],
            }
        }
    # The torch fc1 consumed NCHW-flattened conv output; our flatten is
    # NHWC. Permute the input rows of the dense kernel accordingly.
    w = sd["encoder.fc1.weight"]  # (256, C*H*W) in torch CHW order
    conv_out_hw = _encoder_out_hw(sd)
    c, h, wd = conv_out_hw
    w = w.reshape(256, c, h, wd).transpose(0, 2, 3, 1).reshape(256, -1)
    params["encoder"]["Dense_0"] = {
        "kernel": _t(w),
        "bias": sd["encoder.fc1.bias"],
    }

    trunk = {
        f"fcm{j+1}": {
            "kernel": _t(sd[f"actor.fcm{j+1}.weight"]),
            "bias": sd[f"actor.fcm{j+1}.bias"],
        }
        for j in range(3)
    }
    head = {
        f"fc{j+1}": {
            "kernel": _t(sd[f"actor.fc{j+1}.weight"]),
            "bias": sd[f"actor.fc{j+1}.bias"],
        }
        for j in range(4)
    }
    params["actor"] = {"_ManeuverTrunk_0": trunk, "_ActorHead_0": head}
    return {
        "params": params,
        "batch_stats": stats,
    }


def _encoder_out_hw(sd: Dict[str, np.ndarray]) -> Tuple[int, int, int]:
    """Infer the conv-stack output (C,H,W) from fc1's input size given the
    known channel count (64) and the reference resolutions."""
    in_size = sd["encoder.fc1.weight"].shape[1]
    c = 64
    hw = in_size // c
    # the two reference aspect ratios: 128x160 -> 4x5, 64x160 -> 2x5
    for h, w in ((4, 5), (2, 5), (8, 10)):
        if h * w == hw:
            return c, h, w
    raise ValueError(f"unrecognized encoder output size {in_size}")


def load_pretrained(
    image_dim: Tuple[int, int, int],
    maneuver_dim: int = DEFAULT_M_DIM,
    action_dim: int = DEFAULT_A_DIM,
    cache_dir: str = "/tmp",
):
    """Load a pretrained combo for `image_dim`: the reference torch
    checkpoint (download + convert, mirroring reference
    tinycar_net.py:113-129) when reachable, else the combo bundled with
    this package (trained by examples/train_stanley_il.py on the
    framework itself; curve in docs/TRAINING.md). Returns flax variables
    or None."""
    if maneuver_dim != DEFAULT_M_DIM or action_dim != DEFAULT_A_DIM:
        print(
            f"No pretrained weights found for image_dim: {image_dim}, "
            f"maneuver_dim: {maneuver_dim}, action_dim: {action_dim}"
        )
        return None
    if len(image_dim) == 3 and image_dim[-1] in (1, 3):
        # (H, W, C) rgb observation shape -> the (C, H, W) catalog key
        image_dim = (image_dim[2], image_dim[0], image_dim[1])
    if image_dim in model_urls:
        url = model_urls[image_dim]
        cached = os.path.join(cache_dir, os.path.basename(url))
        if not os.path.exists(cached):
            try:
                import urllib.request

                urllib.request.urlretrieve(url, cached)
            except Exception as e:  # no egress / offline
                print(f"Could not download pretrained weights: {e}")
                cached = None
        if cached is not None and os.path.exists(cached):
            try:
                return load_torch_state_dict(cached)
            except Exception as e:  # no torch / corrupt partial download
                print(
                    f"Could not convert torch checkpoint {cached}: {e}; "
                    "falling back to the bundled combo"
                )
    bundled = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "pretrained",
        "tinycar_combo_flax_{}_{}_{}.npz".format(*image_dim),
    )
    if os.path.exists(bundled):
        from tinycarlo_tpu.train.il import load_variables_npz

        print(f"loaded bundled pretrained combo: {bundled}")
        return load_variables_npz(bundled)
    print(f"No pretrained weights found for image_dim: {image_dim}")
    return None
