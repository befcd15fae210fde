"""Profiling / tracing hooks.

The reference has none (SURVEY.md §5: only coarse step_time, plus a
CUDA_LAUNCH_BLOCKING=1 debugging posture we do NOT replicate). Here:
  * `start_profiler_server(port)` — jax.profiler gRPC endpoint for
    TensorBoard / xprof capture on a live job
  * `trace(dir)` — context manager writing a TensorBoard trace of a step
  * `StepTimer` — rolling wall-time + tokens/sec accounting for train/serve
"""

from __future__ import annotations

import contextlib
import time

import jax


def start_profiler_server(port: int = 9999):
    jax.profiler.start_server(port)
    print(f"jax.profiler server on :{port}")


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def avg_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def tokens_per_sec(self, tokens_per_step: int) -> float:
        return tokens_per_step / max(self.avg_s, 1e-9)


def measure_dispatch_rtt(reps: int = 20) -> float:
    """Median wall time of a minimal jitted dispatch + host fetch of a tiny
    result — on a tunneled backend (axon) this is the per-call round-trip
    tax every top-level executable pays (~30 ms measured), on a local
    backend it is the PJRT dispatch floor (~100 us). Subtracting
    `dispatches * rtt` from an accumulated dispatch->fetch wall total
    isolates on-device compute, which is how bench.py turns the tunneled
    serving number into an auditable on-VM estimate
    (serve_device_tok_per_s)."""
    import numpy as np

    import jax.numpy as jnp

    tick = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    np.asarray(tick(x))  # compile outside the timed window
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(tick(x))
        ts.append(time.time() - t0)
    return float(np.median(ts))
