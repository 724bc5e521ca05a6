"""Stanley-expert imitation learning, on-device.

Reference pipeline (examples/train_stanley_il.py): per-episode camera
domain randomization (pitch in [10,20), fov in [90,130)), Stanley expert
with OU noise collecting (obs, maneuver, steering) tuples every
SKIP_STEPS frames, then supervised MSE training of TinycarCombo.

TPU-native re-design: collection runs a *batch* of envs under one jitted
scan per chunk (each chunk gets freshly randomized camera matrices --
the batched analogue of per-episode randomization), and the training step
is a jitted optax/BatchNorm update over device-resident data.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tinycarlo_tpu import camera as cam
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu import vector
from tinycarlo_tpu.models.tinycar_net import TinycarCombo, pre_obs
from tinycarlo_tpu.train.stanley import ou_step, stanley_steering


@struct.dataclass
class ILConfig:
    """Defaults mirror reference train_stanley_il.py:18-36."""

    learning_rate: float = struct.field(pytree_node=False, default=1e-4)
    batch_size: int = struct.field(pytree_node=False, default=32)
    steps: int = struct.field(pytree_node=False, default=10_000)
    speed: float = struct.field(pytree_node=False, default=0.5)
    k: float = struct.field(pytree_node=False, default=5.0)
    noise_theta: float = struct.field(pytree_node=False, default=0.1)
    noise_sigma: float = struct.field(pytree_node=False, default=0.4)
    skip_steps: int = struct.field(pytree_node=False, default=2)
    maneuver_dim: int = struct.field(pytree_node=False, default=3)
    action_dim: int = struct.field(pytree_node=False, default=1)
    # collection-time divergence cut: the reference collects under
    # CTETerminationWrapper(max_cte=0.15) (train_stanley_il.py:84),
    # terminating (here: auto-resetting) cars the OU noise pushed off
    # the path instead of recording their runaway frames/labels
    collect_max_cte: float = struct.field(pytree_node=False, default=0.15)
    # turn-weighted MSE (extension; 0.0 = the reference's plain MSE,
    # train_stanley_il.py:117-124). Straight-driving frames (|label|
    # near 0) dominate expert datasets even with maneuver-balanced
    # batches, so the tanh head under-commits on the rare sharp-turn
    # frames (measured: turn-frame |pred| plateaus ~0.93 against
    # clipped-expert 1.0, docs/TRAINING.md round-5). w > 0 weights each
    # sample by 1 + w*min(|label|, 1), normalized per batch.
    turn_weight: float = struct.field(pytree_node=False, default=0.0)
    # per-chunk camera domain randomization (the reference's protocol,
    # train_stanley_il.py:53-57). False trains against the fixed default
    # camera -- the in-sim-optimal choice when the checkpoint is
    # evaluated/served under that same camera (DR buys hardware
    # transfer at the cost of a scale-ambiguous mapping: the net cannot
    # observe pitch/fov, so apparent junction distance is ambiguous).
    camera_dr: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class ILState:
    variables: Any  # {'params', 'batch_stats'}
    opt_state: Any
    model: TinycarCombo = struct.field(pytree_node=False, default=None)


def create(key: jnp.ndarray, obs_shape: Tuple[int, ...], cfg: ILConfig) -> ILState:
    """obs_shape is the env's (C,H,W) or (H,W,3); the model consumes NHWC."""
    model = TinycarCombo(
        maneuver_dim=cfg.maneuver_dim, action_dim=cfg.action_dim
    )
    dummy = pre_obs(jnp.zeros((1, *obs_shape), jnp.uint8))
    variables = model.init(
        key, dummy, jnp.zeros((1, cfg.maneuver_dim)), train=False
    )
    tx = optax.adam(cfg.learning_rate)
    return ILState(
        variables=variables,
        opt_state=tx.init(variables["params"]),
        model=model,
    )


def train_step(
    state: ILState, cfg: ILConfig, batch: Dict[str, jnp.ndarray]
) -> Tuple[ILState, jnp.ndarray]:
    """MSE regression of the combo onto expert steering
    (train_stanley_il.py:117-124). batch: x (B,H,W,C float), m (B,M one-hot),
    y (B,A). BatchNorm runs in train mode with running-stat updates."""

    def loss_fn(params):
        out, mutated = state.model.apply(
            {"params": params, "batch_stats": state.variables["batch_stats"]},
            batch["x"],
            batch["m"],
            train=True,
            mutable=["batch_stats"],
        )
        err = (out - batch["y"]) ** 2
        if cfg.turn_weight:
            w = 1.0 + cfg.turn_weight * jnp.minimum(
                jnp.abs(batch["y"]), 1.0
            )
            return jnp.sum(w * err) / jnp.sum(w), mutated["batch_stats"]
        return jnp.mean(err), mutated["batch_stats"]

    tx = optax.adam(cfg.learning_rate)
    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.variables["params"]
    )
    updates, opt_state = tx.update(
        grads, state.opt_state, state.variables["params"]
    )
    params = optax.apply_updates(state.variables["params"], updates)
    return (
        state.replace(
            variables={"params": params, "batch_stats": new_stats},
            opt_state=opt_state,
        ),
        loss,
    )


def train_chunk(
    state: ILState,
    cfg: ILConfig,
    key: jnp.ndarray,
    data: Dict[str, jnp.ndarray],  # x (N,...) uint8, m (N,) int32, y (N,A)
    n_steps: int,
) -> Tuple[ILState, jnp.ndarray]:
    """`n_steps` fused train steps over a device-resident dataset: batch
    indices are drawn on-device and the uint8->float conversion happens
    per batch inside the scan, so the host pays one dispatch per chunk
    instead of one per step (the reference pays a host->GPU copy per step,
    train_stanley_il.py:119-121). Returns (state, losses (n_steps,)).

    If `data` carries `pools` ((M, P) int32 per-maneuver sample-index
    pools, repeat-padded) and `pool_n` ((M,) live pool sizes), batches
    are drawn MANEUVER-BALANCED: batch_size // M indices per maneuver
    plus a uniform remainder. Left turns are rare on loop maps even
    inside left-maneuver collection chunks, so uniform sampling lets
    straight-driving frames dominate the MSE; balancing the batch (an
    extension -- the reference trains uniform, train_stanley_il.py:119)
    equalizes the per-maneuver gradient mass without changing the model
    or the data."""
    n = data["x"].shape[0]

    def body(s, k):
        if "pools" in data:
            n_m = data["pools"].shape[0]
            per = cfg.batch_size // n_m
            ks = jax.random.split(k, n_m + 1)
            parts = [
                data["pools"][m][
                    jax.random.randint(ks[m], (per,), 0, data["pool_n"][m])
                ]
                for m in range(n_m)
            ]
            rem = cfg.batch_size - per * n_m
            if rem:
                parts.append(jax.random.randint(ks[n_m], (rem,), 0, n))
            idx = jnp.concatenate(parts)
        else:
            idx = jax.random.randint(k, (cfg.batch_size,), 0, n)
        batch = {
            "x": pre_obs(data["x"][idx]),
            "m": jax.nn.one_hot(data["m"][idx], cfg.maneuver_dim),
            "y": data["y"][idx],
        }
        s, loss = train_step(s, cfg, batch)
        return s, loss

    return jax.lax.scan(body, state, jax.random.split(key, n_steps))


def save_variables_npz(path: str, variables: Any) -> None:
    """Flatten a flax variables pytree into a flat npz keyed by
    '/'-joined paths (the framework's torch-free checkpoint format for
    examples; Orbax in utils/checkpoint.py is the production path)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(variables))
    np.savez(
        path,
        **{
            "/".join(str(getattr(k, "key", k)) for k in p): leaf
            for p, leaf in flat
        },
    )


def load_variables_npz(path: str) -> Any:
    """Inverse of `save_variables_npz`: rebuild the nested dict pytree."""
    out: Dict[str, Any] = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return out


def randomize_camera(
    params: fenv.EnvParams, key: jnp.ndarray
) -> fenv.EnvParams:
    """Fresh camera matrices with pitch ~ U{10..19}, fov ~ U{90..129}
    (reference train_stanley_il.py:53-57), rebuilt on-device."""
    kp, kf = jax.random.split(key)
    dtype = params.camera.E.dtype
    cfg = params.cfg.camera
    pitch = jax.random.randint(kp, (), 10, 20).astype(dtype)
    fov = jax.random.randint(kf, (), 90, 130).astype(dtype)
    orientation = jnp.asarray(cfg.orientation, dtype).at[0].set(pitch)
    matrices = cam.CameraMatrices(
        E=cam.extrinsic_matrix(orientation, jnp.asarray(cfg.position, dtype)),
        K=cam.intrinsic_matrix(fov, tuple(cfg.resolution), dtype),
    )
    return params.replace(camera=matrices)


def collect_chunk(
    params: fenv.EnvParams,
    cfg: ILConfig,
    key: jnp.ndarray,
    n_envs: int,
    chunk_steps: int,
    maneuver: jnp.ndarray,  # (B,) int32
):
    """One jitted collection chunk: randomized camera, Stanley expert with
    OU noise, observations collected every `skip_steps` sim steps (the
    scan stores every frame; the caller keeps rows where `keep` is True,
    mirroring train_stanley_il.py:68-74).

    Returns dict of stacked trajectories:
      obs (T', B, ...) uint8, maneuver (B,), steering (T', B), keep (T',)
    where T' = chunk_steps // skip_steps sampled frames.
    """
    k_cam, k_reset, k_scan = jax.random.split(key, 3)
    if cfg.camera_dr:
        params = randomize_camera(params, k_cam)
    # Collection runs under the reference's CTETerminationWrapper
    # (train_stanley_il.py:84: max_cte=0.15): a diverged car (OU noise
    # off a turn) terminates and auto-resets instead of continuing to
    # emit off-path frames with runaway Stanley labels. Without this,
    # oversampled left-maneuver chunks accumulate exactly that garbage
    # and MORE left data makes left turns WORSE (the round-5 m2x sweep,
    # docs/TRAINING.md).
    from tinycarlo_tpu.wrapper.functional import (
        WrapperStack,
        cte_termination,
    )

    stack = WrapperStack(
        termination_fns=(
            partial(
                cte_termination, max_cte=cfg.collect_max_cte,
                number_of_steps=1,
            ),
        ),
    )
    vstate, _ = vector.reset(
        params, k_reset, n_envs, stack=stack, render=False
    )
    max_steer = params.cfg.car.max_steering_angle
    env_dtype = params.camera.E.dtype
    noise0 = jnp.zeros((n_envs, cfg.action_dim), env_dtype)

    def body(carry, inp):
        vstate, noise, info = carry
        i, k = inp
        noise = ou_step(
            noise, k, cfg.noise_theta, 0.0, cfg.noise_sigma
        )
        steering = stanley_steering(
            info["cte"], info["heading_error"], cfg.speed, cfg.k, max_steer
        )
        # sampled frame every skip_steps: render only those
        sample_now = (i + 1) % cfg.skip_steps == 0
        obs = jax.lax.cond(
            sample_now,
            lambda: fenv.render_observation_batch(params, vstate.env),
            lambda: jnp.zeros(
                (n_envs, *fenv.observation_shape(params)), jnp.uint8
            ),
        )
        act_maneuver = jnp.where(maneuver != 2, maneuver, 3)
        action = {
            "car_control": jnp.stack(
                [
                    jnp.full((n_envs,), cfg.speed, env_dtype),
                    (steering + noise[:, 0]).astype(env_dtype),
                ],
                axis=-1,
            ),
            "maneuver": act_maneuver,
        }
        vstate, _, _, _, _, info = vector.step(
            params, vstate, action, stack=stack, render=False
        )
        out = {
            "obs": obs,
            "steering": steering,
            "keep": sample_now,
        }
        return (vstate, noise, info), out

    info0 = jax.vmap(lambda s: fenv._info(params, s))(
        jax.tree.map(lambda x: x, vstate.env)
    )
    keys = jax.random.split(k_scan, chunk_steps)
    idx = jnp.arange(chunk_steps)
    (_, _, _), traj = jax.lax.scan(
        body, (vstate, noise0, info0), (idx, keys)
    )
    return traj


def collect_chunk_dagger(
    params: fenv.EnvParams,
    cfg: ILConfig,
    key: jnp.ndarray,
    n_envs: int,
    chunk_steps: int,
    maneuver: jnp.ndarray,  # (B,) int32, MODEL space (2 = left)
    model: Any,
    variables: Any,
):
    """DAgger correction chunk: the CAR follows the trained net's policy
    while the LABEL stays the Stanley expert (Ross et al. 2011's core
    move; an extension -- the reference only does expert+noise rollouts,
    train_stanley_il.py:62-74). The net visits its own failure states
    (e.g. drifting wide mid-left-turn) and the dataset records the
    expert's correction there, attacking compounding error directly --
    the measured maneuver-2 failure mode (docs/TRAINING.md round-5).

    Observations render EVERY step (the policy consumes them); every
    `skip_steps`-th frame is kept as a sample, like `collect_chunk`.
    The same collection-time CTE auto-reset bounds how far off-path a
    diverged car can drag the data."""
    k_cam, k_reset, k_scan = jax.random.split(key, 3)
    if cfg.camera_dr:
        params = randomize_camera(params, k_cam)
    from tinycarlo_tpu.wrapper.functional import (
        WrapperStack,
        cte_termination,
    )

    stack = WrapperStack(
        termination_fns=(
            partial(
                cte_termination, max_cte=cfg.collect_max_cte,
                number_of_steps=1,
            ),
        ),
    )
    vstate, _ = vector.reset(
        params, k_reset, n_envs, stack=stack, render=False
    )
    max_steer = params.cfg.car.max_steering_angle
    env_dtype = params.camera.E.dtype
    onehot = jax.nn.one_hot(maneuver, cfg.maneuver_dim, dtype=jnp.float32)
    act_maneuver = jnp.where(maneuver != 2, maneuver, 3)

    def body(carry, inp):
        vstate, info = carry
        i = inp
        label = stanley_steering(
            info["cte"], info["heading_error"], cfg.speed, cfg.k, max_steer
        )
        obs = fenv.render_observation_batch(params, vstate.env)
        act = model.apply(variables, pre_obs(obs), onehot, train=False)
        steer = jnp.clip(act[:, 0], -1.0, 1.0)
        action = {
            "car_control": jnp.stack(
                [
                    jnp.full((n_envs,), cfg.speed, env_dtype),
                    steer.astype(env_dtype),
                ],
                axis=-1,
            ),
            "maneuver": act_maneuver,
        }
        vstate, _, _, _, _, info = vector.step(
            params, vstate, action, stack=stack, render=False
        )
        out = {
            "obs": obs,
            "steering": label,
            "keep": (i + 1) % cfg.skip_steps == 0,
        }
        return (vstate, info), out

    info0 = jax.vmap(lambda s: fenv._info(params, s))(vstate.env)
    (_, _), traj = jax.lax.scan(
        body, (vstate, info0), jnp.arange(chunk_steps)
    )
    return traj


def collect_dataset_dagger(
    params: fenv.EnvParams,
    cfg: ILConfig,
    key: jnp.ndarray,
    n_samples: int,
    model: Any,
    variables: Any,
    n_envs: int = 16,
    chunk_steps: int = 128,
    maneuver_cycle=(0, 1, 2),
):
    """`collect_dataset` over policy-rollout chunks
    (`collect_chunk_dagger`): (X, M, Y) where X are states the CURRENT
    net reaches and Y the expert's steering there."""
    collect = jax.jit(
        partial(
            collect_chunk_dagger,
            params,
            cfg,
            n_envs=n_envs,
            chunk_steps=chunk_steps,
            model=model,
        )
    )
    xs, ms, ys = [], [], []
    total = 0
    chunk_i = 0
    while total < n_samples:
        key, sub = jax.random.split(key)
        m_id = int(maneuver_cycle[chunk_i % len(maneuver_cycle)])
        maneuver = jnp.full((n_envs,), m_id, jnp.int32)
        traj = jax.device_get(
            collect(sub, maneuver=maneuver, variables=variables)
        )
        keep = traj["keep"].astype(bool)
        obs = traj["obs"][keep].reshape(-1, *traj["obs"].shape[2:])
        steer = traj["steering"][keep].reshape(-1)
        n = obs.shape[0]
        xs.append(obs)
        ms.append(np.full(n, m_id, np.float32))
        ys.append(steer[:, None].astype(np.float32))
        total += n
        chunk_i += 1
    X = np.concatenate(xs)[:n_samples]
    M = np.concatenate(ms)[:n_samples]
    Y = np.concatenate(ys)[:n_samples]
    return X, M, Y


def collect_dataset(
    params: fenv.EnvParams,
    cfg: ILConfig,
    key: jnp.ndarray,
    n_samples: int,
    n_envs: int = 16,
    chunk_steps: int = 128,
    maneuver_cycle=(0, 1, 2),
):
    """Fill (X, M, Y) arrays of `n_samples` expert transitions using
    batched chunks; maneuvers cycle `maneuver_cycle` per chunk (default
    0,1,2 like the reference's per-episode cycle,
    train_stanley_il.py:104-107). A cycle like (0, 1, 2, 2) oversamples
    the left maneuver, whose turns are rare on loop maps -- without it
    the m=2 data is dominated by straight driving and the net
    under-fits left turns (docs/TRAINING.md maneuver-2 caveat)."""
    collect = jax.jit(
        partial(
            collect_chunk,
            params,
            cfg,
            n_envs=n_envs,
            chunk_steps=chunk_steps,
        )
    )
    xs, ms, ys = [], [], []
    total = 0
    chunk_i = 0
    while total < n_samples:
        key, sub = jax.random.split(key)
        m_id = int(maneuver_cycle[chunk_i % len(maneuver_cycle)])
        maneuver = jnp.full((n_envs,), m_id, jnp.int32)
        traj = jax.device_get(collect(sub, maneuver=maneuver))
        keep = traj["keep"].astype(bool)
        obs = traj["obs"][keep].reshape(-1, *traj["obs"].shape[2:])
        steer = traj["steering"][keep].reshape(-1)
        n = obs.shape[0]
        xs.append(obs)
        ms.append(np.full(n, m_id, np.float32))
        ys.append(steer[:, None].astype(np.float32))
        total += n
        chunk_i += 1
    X = np.concatenate(xs)[:n_samples]
    M = np.concatenate(ms)[:n_samples]
    Y = np.concatenate(ys)[:n_samples]
    return X, M, Y
