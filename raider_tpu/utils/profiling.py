"""Per-stage wall-time tracing and optional device profiling.

The reference has no built-in tracing (SURVEY section 5); this module adds
the TPU-build equivalents: named stage timers around fetch/load/kernel
boundaries (logged + queryable) and a context manager that captures a
jax.profiler trace for offline analysis in TensorBoard/Perfetto.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

from raider_tpu.logger import logger

_stage_totals: Dict[str, float] = defaultdict(float)
_stage_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage(name: str, log: bool = True) -> Iterator[None]:
    """Time a named pipeline stage; accumulates into the session report."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _stage_totals[name] += dt
        _stage_counts[name] += 1
        if log:
            logger.debug('[stage] %s: %.3f s', name, dt)


def stage_report(reset: bool = False) -> Dict[str, dict]:
    """Accumulated per-stage timings: {name: {total_s, calls, mean_s}}."""
    out = {
        name: {
            'total_s': total,
            'calls': _stage_counts[name],
            'mean_s': total / max(_stage_counts[name], 1),
        }
        for name, total in _stage_totals.items()
    }
    if reset:
        _stage_totals.clear()
        _stage_counts.clear()
    return out


def log_stage_report() -> None:
    report = stage_report()
    if not report:
        return
    logger.info('--- stage timing report ---')
    for name, row in sorted(report.items(), key=lambda kv: -kv[1]['total_s']):
        logger.info('  %-28s %8.3f s  (%d calls)', name, row['total_s'], row['calls'])


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/Perfetto) around a region.

    No-op when log_dir is None, so callers can leave the hook in place.
    """
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info('Wrote device trace to %s', log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up in device traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
