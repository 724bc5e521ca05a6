"""Profiling / tracing helpers.

The reference's entire profiling system is `DEBUG=1` wall-clock prints
(reference: tinycarlo/env.py:144-145, camera.py:99-109) and ad-hoc
steps/s counters (stanley_control.py:63). TPU-native equivalents:

  * `trace(...)`: context manager around `jax.profiler` writing a
    TensorBoard/XProf trace of the jitted programs;
  * `StepsPerSecond`: a `block_until_ready`-bracketed throughput counter;
  * the `DEBUG` env flag (`tinycarlo_tpu.utils.helper.getenv`) still
    gates per-step timing prints in the Gymnasium shim.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tinycarlo_tpu_trace") -> Iterator[None]:
    """Capture a device trace: `with profiling.trace(): step(...)`, then
    inspect with TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepsPerSecond:
    """Throughput meter: call `tick(n_steps, result)` after each chunk;
    `rate` excludes the first (compile-bearing) tick by default."""

    def __init__(self, skip_first: bool = True):
        self.skip_first = skip_first
        self._steps = 0
        self._start: Optional[float] = None
        self._ticks = 0

    def tick(self, n_steps: int, result=None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        self._ticks += 1
        if self.skip_first and self._ticks == 1:
            self._start = time.perf_counter()
            return
        if self._start is None:
            self._start = time.perf_counter()
        self._steps += n_steps

    @property
    def rate(self) -> float:
        if self._start is None or self._steps == 0:
            return 0.0
        return self._steps / (time.perf_counter() - self._start)
