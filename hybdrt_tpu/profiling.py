"""Structured timing and device profiling.

The reference has only ad-hoc diagnostic prints (reference drtbase.py:123,
drtmd.py:316-319); here timing and XLA traces are a first-class module
(SURVEY §5): a hierarchical wall-clock timer plus jax.profiler integration.
"""
import json
import time
from contextlib import contextmanager
from collections import defaultdict

import jax


def _device_sync():
    """Block until previously dispatched device work completes. A trivial
    computation enqueued now executes after all pending work on the default
    device's in-order stream, so blocking on it drains the queue
    (jax.effects_barrier only waits for ordered side effects, not pure
    dispatches)."""
    try:
        import jax.numpy as jnp
        (jnp.zeros(()) + 0).block_until_ready()
    except Exception:
        pass


class Timer:
    """Hierarchical wall-clock timer with jax dispatch synchronization."""

    def __init__(self, synchronize=True):
        self.records = defaultdict(list)
        self.synchronize = synchronize
        self._stack = []

    @contextmanager
    def section(self, name):
        if self.synchronize:
            _device_sync()
        self._stack.append(name)
        key = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.synchronize:
                _device_sync()
            self.records[key].append(time.perf_counter() - t0)
            self._stack.pop()

    def summary(self):
        """{section: {count, total, mean, max}} sorted by total time."""
        out = {}
        for key, vals in self.records.items():
            out[key] = {"count": len(vals), "total": sum(vals),
                        "mean": sum(vals) / len(vals), "max": max(vals)}
        return dict(sorted(out.items(), key=lambda kv: -kv[1]["total"]))

    def report(self, file=None):
        lines = [f"{'section':<40} {'count':>6} {'total(s)':>10} {'mean(s)':>10}"]
        for key, stats in self.summary().items():
            lines.append(f"{key:<40} {stats['count']:>6} {stats['total']:>10.3f} "
                         f"{stats['mean']:>10.4f}")
        text = "\n".join(lines)
        if file is not None:
            print(text, file=file)
        return text

    def to_json(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    def reset(self):
        self.records.clear()


@contextmanager
def device_trace(log_dir, create_perfetto_link=False):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name):
    """Named region that shows up in device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


def block_and_time(fn, *args, repeats=3, **kwargs):
    """Time a jax function properly: compile excluded, outputs blocked."""
    out = fn(*args, **kwargs)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
                 else x, out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
                     else x, out)
        times.append(time.perf_counter() - t0)
    return out, min(times)
