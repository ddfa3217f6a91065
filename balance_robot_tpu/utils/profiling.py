"""Tracing / profiling utilities (SURVEY §5: the reference has none — SB3's
stdout fps table is its only observability; here every phase is measurable).

Three layers:
  * `trace(logdir)` — context manager around `jax.profiler.trace` producing
    a TensorBoard-loadable XPlane trace of the jitted step/update (device
    kernels + host dispatch).
  * `Timer` — lightweight named wall-clock phases with device sync at the
    boundaries (block_until_ready on a probe value), for per-phase step
    timing without a full trace.
  * `Throughput` — env-steps/s counter, the BASELINE headline metric.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir="logs/traces"):
    """Capture a device profile under `logdir` (view with TensorBoard's
    profile plugin or xprof)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-clock phases: `with timer("rollout"): ...`.

    Synchronizes the device at phase exit when given a probe array so the
    measured time covers the dispatched work, not just the dispatch."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def __call__(self, name, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        return {name: dict(total_s=round(tot, 4),
                           mean_ms=round(1e3 * tot / self.counts[name], 3),
                           n=self.counts[name])
                for name, tot in self.totals.items()}


class Throughput:
    """env-steps/s over a sliding window: `tp.add(n_steps)` after each
    dispatched batch; `tp.rate()` for the current estimate."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def add(self, n):
        self.steps += n

    def rate(self):
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
