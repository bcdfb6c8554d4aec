"""Tracing / profiling hooks (SURVEY.md §5.1).

Thin wrappers over jax.profiler with the block-until-ready discipline the
benchmark timer needs; produces TensorBoard/Perfetto traces of the solve
loop.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace of the enclosed block (TensorBoard fmt)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, warmup: int = 1, iters: int = 3, **kw):
    """(result, best_seconds): time `fn` with compile excluded.

    Runs `warmup` untimed calls (triggers compilation), then `iters`
    timed calls, each fully blocked on device completion; reports the
    minimum (steady-state) time.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def phase_costs(solve_fn, factor_fn, *args):
    """Split setup (factor) vs iterate cost for SURVEY §5.1 reporting."""
    _, t_factor = timed(factor_fn, *args)
    _, t_total = timed(solve_fn, *args)
    return {"factor_s": t_factor, "total_s": t_total,
            "iterate_s": max(t_total - t_factor, 0.0)}
