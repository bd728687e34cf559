"""Tracing / profiling helpers (the aux subsystem the reference left
as commented-out time.time() scaffolding, reference
tfgridnet_causal.py:227,243,255,590 — see SURVEY §5)."""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a code block; view in TensorBoard or
    xprof. Usage: `with profiling.trace('runs/tsh/trace'): step(...)`"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class LatencyRecorder:
    """Per-chunk latency histogram for streaming serving."""

    def __init__(self) -> None:
        self.samples: list = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        a = np.asarray(self.samples)
        if not len(a):
            return {}
        return {
            "n": int(len(a)),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p90_ms": float(np.percentile(a, 90) * 1e3),
            "p99_ms": float(np.percentile(a, 99) * 1e3),
            "max_ms": float(a.max() * 1e3),
        }


def cost_analysis(fn, *args) -> dict:
    """Compiled-cost estimate for a jittable function — FLOPs and
    bytes accessed from XLA's own analysis (replaces the reference's
    offline ptflops dependency, reference requirements.txt:23)."""
    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0]
    return {"flops": costs.get("flops", float("nan")),
            "bytes_accessed": costs.get("bytes accessed",
                                        float("nan"))}


def device_step_time(fn, args, n_iters: int = 40) -> float:
    """Trustworthy per-call device time for a chained stateful step:
    differential timing with a forced host fetch (plain
    block_until_ready can lie behind proxied device transports)."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])

    def run(k):
        o = out
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0])
        return time.perf_counter() - t0

    w1 = run(n_iters // 4)
    w2 = run(n_iters)
    return (w2 - w1) / (n_iters - n_iters // 4)
