"""True multi-process multi-host validation on the CPU backend.

SURVEY.md §4 prescribes fake multi-node testing via `jax.distributed` +
CPU device multiplication; BASELINE.json config 5 is the multi-host DP
deployment. This launches TWO separate processes that rendezvous through
`jax.distributed.initialize` (the exact API a TPU pod slice uses, with
DCN collectives replaced by the CPU backend's cross-process transport),
feed per-host env shards via `multihost.local_batch_slice` +
`host_local_array`, and run a jitted sharded `vector.step` with a global
reduction. The result must agree bit-for-bit with a single-process run
of the same 16 envs.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(map_json: str, mode: str, ok_prefix: str):
    """Launch the 2-process pod, return the per-rank OK lines."""
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")

    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    # Repo only: the session harness may inject site dirs (e.g. the axon
    # TPU tunnel's /root/.axon_site) whose sitecustomize hijacks jax's
    # backend/distributed init inside the workers.
    env["PYTHONPATH"] = repo
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(port), map_json, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for rank in (0, 1)
    ]
    ok_lines = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            assert p.returncode == 0, f"worker failed:\n{out}"
            lines = [l for l in out.splitlines() if l.startswith(ok_prefix)]
            assert lines, f"no OK line in worker output:\n{out}"
            ok_lines.append(lines[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return ok_lines


def test_two_process_sharded_step(tmp_path):
    from tinycarlo_tpu.mapgen import loop_track, save_map

    map_json = str(tmp_path / "loop_track.json")
    save_map(loop_track(), map_json)
    ok = _run_workers(map_json, "step", "MULTIHOST_OK")
    checksums = [float(l.split("checksum=")[1]) for l in ok]
    assert checksums[0] == checksums[1], checksums

    # single-process oracle: same 16 envs on this process's 8 virtual
    # devices must produce the identical global checksum
    import jax
    import jax.numpy as jnp

    from tinycarlo_tpu import env as fenv
    from tinycarlo_tpu import vector

    config = {
        "sim": {"fps": 30, "observation_space_format": "classes"},
        "car": {"wheelbase": 0.0487, "track_width": 0.027,
                "max_velocity": 0.15, "max_steering_angle": 30,
                "steering_speed": 30, "max_acceleration": 0.1,
                "max_deceleration": 1.0},
        "camera": {"position": [0.0, -0.005, 0.04], "orientation": [22, 0, 0],
                   "resolution": [32, 40], "fov": 80, "max_range": 0.5,
                   "line_thickness": 1},
        "map": {"json_path": map_json, "pixel_per_meter": 450},
    }
    params = fenv.make_env_params(config)
    state, _ = vector.reset(params, jax.random.PRNGKey(0), 16, render=False)
    action = {
        "car_control": jnp.tile(jnp.asarray([0.5, 0.1], jnp.float32), (16, 1)),
        "maneuver": jnp.zeros((16,), jnp.int32),
    }

    @jax.jit
    def run(state, action):
        checksum = jnp.zeros((), jnp.float64)
        for _ in range(3):
            state, obs, rew, term, trunc, info = vector.step(
                params, state, action, render=True, max_episode_steps=100
            )
            checksum = checksum + jnp.sum(jnp.abs(info["cte"]).astype(jnp.float64))
            checksum = checksum + jnp.sum(rew.astype(jnp.float64)) + jnp.sum(obs.astype(jnp.float64)) / 255.0
        return state, checksum

    _, oracle = run(state, action)
    np.testing.assert_allclose(checksums[0], float(oracle), rtol=1e-12)


def test_two_process_td3_chunk(tmp_path):
    """BASELINE config 5 as ONE cross-process program (round-4 verdict
    item 2): the fused TD3 chunk -- DP-sharded envs fed per host, the
    replicated replay buffer, TP-sharded actor/critic/optimizer state,
    and the SP renderer inside the chunk -- runs across two real
    processes under `jax.distributed` and is BIT-EQUAL to the
    single-process oracle running the identical sharded program on this
    process's 8 virtual devices (same global mesh -> same partitioned
    HLO; only the collective transport differs). A plain UNSHARDED
    chunk is additionally compared loosely: the TP row-parallel psum
    reorders f32 sums, so actions (and the rollout they drive) drift by
    ulps relative to the unpartitioned matmuls -- that drift is the
    expected cost of TP, not a defect."""
    from tinycarlo_tpu.mapgen import loop_track, save_map

    map_json = str(tmp_path / "loop_track.json")
    save_map(loop_track(), map_json)
    ok = _run_workers(map_json, "chunk", "MULTIHOST_CHUNK_OK")
    rolls = [float(l.split("roll=")[1].split()[0]) for l in ok]
    losses = [float(l.split("loss=")[1].split()[0]) for l in ok]
    assert rolls[0] == rolls[1], rolls
    assert losses[0] == losses[1], losses

    import jax

    from tests._multihost_chunk_common import (
        N_ENVS, N_STEPS, SEED, checksum_fn, encoder_apply, make_setup,
        run_sharded_chunk,
    )

    # bit-equality oracle: the SAME sharded program, single process
    roll_o, loss_o = run_sharded_chunk(map_json)
    assert rolls[0] == roll_o, (rolls[0], roll_o)
    assert losses[0] == loss_o, (losses[0], loss_o)

    # sanity cross-check vs the fully-unsharded chunk (TP ulp drift)
    from tinycarlo_tpu.train.td3_loop import chunk, init_loop

    params, tcfg, loop_cfg = make_setup(map_json)
    state0 = init_loop(params, tcfg, loop_cfg, jax.random.PRNGKey(SEED),
                       N_ENVS)

    @jax.jit
    def run(state):
        state, out = chunk(
            state, params=params, cfg=tcfg, loop_cfg=loop_cfg,
            encoder_apply=encoder_apply, n_steps=N_STEPS,
        )
        return checksum_fn(state, out)

    roll_u, loss_u = run(state0)
    np.testing.assert_allclose(rolls[0], float(roll_u), rtol=1e-6)
    np.testing.assert_allclose(losses[0], float(loss_u), rtol=1e-4)
