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


def test_two_process_sharded_step(tmp_path):
    from tinycarlo_tpu.mapgen import loop_track, save_map

    map_json = str(tmp_path / "loop_track.json")
    save_map(loop_track(), map_json)
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
            [sys.executable, worker, str(rank), str(port), map_json],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    checksums = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert lines, f"no OK line in worker output:\n{out}"
        checksums.append(float(lines[0].split("checksum=")[1]))
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
