"""Autosys-style hardware backend: UDP-multicast tracked toy car.

Structural equivalent of the reference's only real deployment
(reference: tinycarlo/real_world/environments/env_autosys.py): pose from
multicast camera tracking (`PoseTracker`), drive commands to a "tinycar"
servo/motor bridge, blinkers mapped from maneuvers, tracking-timeout
motor stop, velocity estimated from successive tracked positions, and
history-replay repositioning. The hardware client library (`tinycar`) and
the lane-segmentation camera net are external; their call sites are kept
behind a small transport interface so this module imports and is testable
without the hardware present.
"""
from __future__ import annotations

import math
import time
from collections import deque
from typing import Optional, Tuple

import numpy as np

from tinycarlo_tpu.real_world.base import RealWorldCamera, RealWorldCar
from tinycarlo_tpu.real_world.tracking import PoseTracker
from tinycarlo_tpu.utils.helper import getenv


class TinycarTransport:
    """Servo/motor/blinker command channel.

    Default implementation tries the external `tinycar` client library
    (the reference's hardware dependency, env_autosys.py:7,108); absent
    hardware, commands are no-ops so the digital-twin env still runs.
    """

    def __init__(self, hostname: str = "localhost"):
        self._impl = None
        try:
            from tinycar import Tinycar  # external hardware library

            self._impl = Tinycar(hostname)
        except ImportError:
            pass

    def set_servo_angle(self, centidegrees: int) -> None:
        if self._impl is not None:
            self._impl.setServoAngle(centidegrees)

    def set_motor_duty_cycle(self, duty: int) -> None:
        if self._impl is not None:
            self._impl.setMotorDutyCycle(duty)

    def set_blinker(self, mode: str) -> None:
        if self._impl is None:
            return
        {
            "off": self._impl.setBlinkerOff,
            "left": self._impl.setBlinkerLeft,
            "right": self._impl.setBlinkerRight,
            "hazard": self._impl.setBlinkerHazard,
        }[mode]()


class AutosysCar(RealWorldCar):
    """Reference AutosysCar semantics (env_autosys.py:102-222)."""

    def __init__(
        self,
        hostname: str = "localhost",
        pixel_per_meter: float = 450.0,
        max_steering_deg: float = 30.0,
        tracking_timeout: float = 0.5,
    ):
        self.transport = TinycarTransport(hostname)
        self.tracker = PoseTracker()
        self.ppm = pixel_per_meter
        self.max_steering_deg = max_steering_deg
        self.timeout = tracking_timeout
        self.history: deque = deque(maxlen=20)  # for reverse repositioning
        self._position = np.zeros(2)
        self._rotation = 0.0
        self._velocity = 0.0
        self._last_update: Optional[float] = None

    def connect(self) -> None:
        self.tracker.start()

    def drive(self, velocity: float, steering: float, maneuver: int) -> None:
        steering_deg = steering * self.max_steering_deg
        blinker = {0: "off", 1: "right", 3: "left"}.get(maneuver)
        if blinker:
            self.transport.set_blinker(blinker)
        self.history.append((steering_deg, velocity))
        self._send(steering_deg, velocity)

    def _send(self, steering_deg: float, speed: float) -> None:
        # stuck cars get a kick (reference env_autosys.py:185-187)
        if abs(self._velocity) < 0.01:
            speed *= 2.5
        speed = float(np.clip(speed, -1.0, 1.0))
        self.transport.set_servo_angle(int(9000 + steering_deg * 100))
        self.transport.set_motor_duty_cycle(int(speed * 100))
        if not self._wait_for_tracking():
            # tracking lost: stop the motor (env_autosys.py:192-195)
            self.transport.set_motor_duty_cycle(0)
            self.transport.set_servo_angle(9000)

    def _wait_for_tracking(self, use_timeout: bool = True) -> bool:
        st = time.perf_counter()
        sample = None
        while sample is None:
            sample = self.tracker.get()
            if sample is None and use_timeout and (
                time.perf_counter() - st > self.timeout
            ):
                return False
        _, x_px, y_px, rot = sample
        pos = np.asarray([x_px / self.ppm, y_px / self.ppm])
        now = time.perf_counter()
        if self._last_update is not None:
            dt = now - self._last_update
            if dt > 0:
                self._velocity = float(
                    np.linalg.norm(pos - self._position) / dt
                )
        self._last_update = now
        self._position = pos
        self._rotation = math.atan2(math.sin(rot), math.cos(rot))
        return True

    def pose(self) -> Tuple[np.ndarray, float, float]:
        self.tracker.get() and self._wait_for_tracking()  # drain latest
        return self._position.copy(), self._rotation, self._velocity

    def reposition(self, target_position, target_rotation) -> None:
        """Replay the action history in reverse to back onto the lanepath
        (reference env_autosys.py:148-153); full Stanley drive-back needs
        the env's info stream and lives in the deployment script."""
        self.transport.set_blinker("hazard")
        while self.history:
            steering_deg, speed = self.history.pop()
            self._send(steering_deg, -speed)
            if (
                np.linalg.norm(self._position - np.asarray(target_position))
                < 0.02
            ):
                break
        self.transport.set_blinker("off")
        self.transport.set_motor_duty_cycle(0)
        self.transport.set_servo_angle(9000)

    def stop(self) -> None:
        self.transport.set_motor_duty_cycle(0)
        self.tracker.stop()


class AutosysCamera(RealWorldCamera):
    """Hardware camera: raw frames via the tinycar library, optionally
    passed through an external lane-segmentation net to produce
    tinycarlo-style class masks (reference env_autosys.py:17-50; RAW=1
    bypasses the net). Returns None (digital-twin view) when the
    hardware/net are unavailable."""

    def __init__(self, resolution=(224, 320)):
        self.resolution = resolution
        self._get_frame = None
        self._segment = None

    def connect(self) -> None:
        try:
            from tinycar import Tinycar  # noqa: F401

            # deployment wires self._get_frame to the hardware stream
        except ImportError:
            return
        if not getenv("RAW"):
            try:
                import lanedetection  # external segmentation package

                self._segment = lanedetection.load_default()
            except ImportError:
                pass

    def capture(self):
        if self._get_frame is None:
            return None
        frame = self._get_frame()
        if self._segment is not None:
            return self._segment(frame)
        return frame
