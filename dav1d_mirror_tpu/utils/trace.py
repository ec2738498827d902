"""Decode-stage tracing (the framework's observability layer).

The reference has no built-in tracer (SURVEY §5.1): it relies on
checkasm cycle counts and the CLI frametimes log. Here tracing is a
first-class utility: `trace_scope` accumulates wall-clock per named
stage (host entropy, MC batches, residual itx, filters, grain, ...);
`report()` renders a per-stage summary; `enabled` is process-global and
off by default (zero overhead when off beyond one branch).

For device-side kernel profiles, use `jax.profiler.trace(logdir)` around
a decode — stages appear in the xplane timeline alongside these host
spans (jax.profiler.TraceAnnotation is applied when available).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

enabled = False
_acc = defaultdict(float)
_cnt = defaultdict(int)


def reset():
    _acc.clear()
    _cnt.clear()


@contextlib.contextmanager
def trace_scope(name: str):
    if not enabled:
        yield
        return
    try:
        import jax.profiler
        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
    except Exception:
        ann = None
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _acc[name] += dt
        _cnt[name] += 1
        if ann is not None:
            ann.__exit__(None, None, None)


def stats() -> dict:
    """{stage: (total_seconds, calls)} accumulated since reset()."""
    return {k: (_acc[k], _cnt[k]) for k in _acc}


def report(out=None) -> str:
    lines = [f"{'stage':24s} {'total ms':>10s} {'calls':>7s} {'ms/call':>9s}"]
    for k in sorted(_acc, key=_acc.get, reverse=True):
        t, n = _acc[k], _cnt[k]
        lines.append(f"{k:24s} {t * 1000:10.2f} {n:7d} "
                     f"{t * 1000 / max(n, 1):9.3f}")
    text = "\n".join(lines)
    if out is not None:
        print(text, file=out)
    return text
