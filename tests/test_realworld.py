"""Real-world bridge tests using the loopback (host-sim) backend."""
import numpy as np
import pytest

from tests.test_env import CONFIG


@pytest.fixture(scope="module")
def rw_env():
    import jax.numpy as jnp

    from tinycarlo_tpu.real_world.env import TinyCarloRealWorldEnv
    from tinycarlo_tpu.real_world.environments.env_loopback import (
        LoopbackCamera,
        LoopbackCar,
    )

    cfg = dict(CONFIG)
    cfg["sim"] = dict(CONFIG.get("sim", {}), real_world_env="loopback")
    car = LoopbackCar(start=(0.9, 1.2, 0.0))
    env = TinyCarloRealWorldEnv(
        config=cfg, dtype=jnp.float64, backend=(car, LoopbackCamera())
    )
    yield env, car
    env.close()


def test_reset_snaps_to_lanepath(rw_env):
    env, car = rw_env
    obs, info = env.reset(seed=0)
    # reposition() placed the car on a lanepath node; cte from that pose
    # must be small
    assert abs(info["cte"]) < 0.05
    assert obs.shape == env.observation_space.shape


def test_step_tracks_hardware_pose(rw_env):
    env, car = rw_env
    env.reset(seed=0)
    before = np.asarray([car.x, car.y])
    obs, rew, term, trunc, info = env.step(
        {"car_control": [0.5, 0.1], "maneuver": 0}
    )
    after = np.asarray([car.x, car.y])
    assert np.linalg.norm(after - before) > 0, "hardware car moved"
    np.testing.assert_allclose(info["position"], after, atol=1e-12)
    assert np.isfinite(rew)
    assert set(info["laneline_distances"].keys())  # map machinery ran


def test_reflection_discovery():
    from tinycarlo_tpu.real_world.env import _resolve
    from tinycarlo_tpu.real_world.environments.env_loopback import (
        LoopbackCamera,
        LoopbackCar,
    )

    car_cls, cam_cls = _resolve("loopback")
    assert car_cls is LoopbackCar and cam_cls is LoopbackCamera


def test_pose_tracker_roundtrip():
    """Send one multicast packet through a real socket pair."""
    import socket
    import struct
    import time

    from tinycarlo_tpu.real_world.tracking import PoseTracker

    tracker = PoseTracker(port=15565)
    tracker.start()
    try:
        sender = socket.socket(socket.AF_INET, socket.SOCK_DGRAM, socket.IPPROTO_UDP)
        sender.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, 1)
        packet = struct.pack("BHHf", 2, 123, 456, 1.5)
        for _ in range(20):
            sender.sendto(packet, ("239.255.255.250", 15565))
            time.sleep(0.05)
            sample = tracker.get()
            if sample is not None:
                break
        assert sample is not None, "no packet received"
        assert sample[0] == 2 and sample[1] == 123.0 and sample[2] == 456.0
        assert sample[3] == pytest.approx(1.5)
        assert tracker.get() is None  # consume-on-read
    finally:
        tracker.stop()
