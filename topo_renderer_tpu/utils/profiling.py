"""Profiling & tracing utilities — first-class observability.

The reference has no profiling at all (SURVEY §5: only `log` macros). The
TPU build treats it as a feature:
  * :class:`FrameTimer` — rolling per-stage wall times with jax blocking
    semantics (a device-synchronized stage timer);
  * :func:`trace` — context manager around `jax.profiler.trace` producing an
    xplane capture;
  * :func:`summarize_trace` — parse a capture and return per-op device
    totals (the tool used to drive this project's own optimization; see
    `scripts/trace_render.py`).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque

import jax


class FrameTimer:
    """Rolling statistics of named stages.

    Usage::
        timer = FrameTimer()
        with timer.stage("render"):
            out = render(...)          # blocked on exit
        print(timer.report())
    """

    def __init__(self, window: int = 120):
        self._window = window
        self._samples: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self._samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def stats(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            if not xs:
                continue
            s = sorted(xs)
            out[name] = {
                "mean_ms": 1e3 * sum(s) / len(s),
                "p50_ms": 1e3 * s[len(s) // 2],
                "min_ms": 1e3 * s[0],
                "max_ms": 1e3 * s[-1],
                "n": float(len(s)),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, st in sorted(self.stats().items()):
            lines.append(
                f"{name:>24}: mean {st['mean_ms']:7.2f} ms  "
                f"p50 {st['p50_ms']:7.2f}  min {st['min_ms']:7.2f}  "
                f"max {st['max_ms']:7.2f}  (n={int(st['n'])})"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/topo_trace"):
    """Capture a jax profiler trace (view in TensorBoard or via
    :func:`summarize_trace`)."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def summarize_trace(log_dir: str, top: int = 25) -> list[tuple[float, str]]:
    """Per-op device time totals (ms) from the newest xplane in ``log_dir``.

    Requires the tensorflow profiler protos shipped with
    tensorboard-plugin-profile; returns [] when unavailable.
    """
    import glob
    import os

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return []
    files = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        return []
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    totals: dict[str, float] = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return [(ms, name) for name, ms in ranked]
