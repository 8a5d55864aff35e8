"""Tracing / profiling utilities (SURVEY.md §5: rebuild plan for the
reference's minimal TimeIt-only instrumentation).

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable device trace.
- :class:`StageTimer` — per-stage wall-clock accounting (used by Compose for
  per-transform timing, replacing the reference's wandb ``_runtime`` columns).
- :func:`block_timed` — time a device computation including completion.
"""

import contextlib
import time
from collections import defaultdict

from dance_tpu.settings import logger
from dance_tpu.typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dance_tpu_trace", *, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    t0 = time.perf_counter()
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("Device trace (%.2fs) written to %s", time.perf_counter() - t0,
                    log_dir)


class StageTimer:
    """Accumulates wall-clock per named stage; ``summary()`` -> dict of seconds."""

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] += dt
            self._counts[name] += 1
            logger.debug("stage %s: %.3fs", name, dt)

    def summary(self) -> Dict[str, float]:
        return dict(self._totals)

    def report(self) -> str:
        lines = [f"{name:<40s} {total:8.3f}s  (n={self._counts[name]})"
                 for name, total in sorted(self._totals.items(),
                                           key=lambda kv: -kv[1])]
        return "\n".join(lines)


def block_timed(fn, *args, **kwargs):
    """Run ``fn`` and block until device completion; returns (result, seconds)."""
    import jax
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
