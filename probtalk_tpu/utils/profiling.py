"""Profiling / tracing utilities.

Upgrades the reference's ad-hoc ``torch.cuda.synchronize()+time.time()``
timing (``nets/inpainting/predictor.py:423-443``, ``refiner.py:541-554``,
``scripts/demo.py:131-181``) to first-class tools:

  * ``device_sync`` — THE completion barrier (a 4-byte scalar fetch);
    ``jax.block_until_ready`` returns at enqueue time on tunneled backends
    (axon) and must never guard a timing scope
  * ``timed`` — wall timing for jitted fns behind ``device_sync``
  * ``trace`` — jax.profiler trace context writing xprof-compatible dumps
  * ``Throughput`` — frames/s and real-time-factor accounting (the fps
    metric of test_holisticbody.py:369)
  * ``flops_estimate`` — compiled-HLO cost analysis (replaces the
    commented-out thop profiling at RTransformer.py:272-302)
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


def device_sync(x) -> None:
    """Reliable completion barrier for arbitrary pytrees of device arrays.

    On the axon (tunneled-TPU) backend ``jax.block_until_ready`` returns at
    enqueue time — only a value fetch guarantees execution finished. A
    scalar reduction per leaf keeps the fetched payload at 4 bytes
    (PERFORMANCE.md round-2 findings; the reference's analogue is
    ``torch.cuda.synchronize``, nets/inpainting/predictor.py:423-443)."""
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(x):
        float(jnp.sum(leaf))


def timed(fn, *args, warmup: int = 1, iters: int = 10, **kwargs):
    """-> (mean_seconds, last_output). Barriers with ``device_sync``."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    device_sync(out)
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(log_dir: str):
    """Profiler trace context (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn, *args, **kwargs):
    """XLA cost analysis of the compiled fn: {'flops', 'bytes accessed', ...}."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    return compiled.cost_analysis()


@dataclass
class Throughput:
    """Accumulates frames/time; reports fps and real-time factor."""

    motion_fps: float = 30.0
    frames: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, frames: int):
        self.seconds += time.perf_counter() - self._t0
        self.frames += frames

    @property
    def fps(self) -> float:
        return self.frames / max(self.seconds, 1e-9)

    @property
    def rtf(self) -> float:
        """Real-time factor: >1 means faster than real time."""
        return self.fps / self.motion_fps
