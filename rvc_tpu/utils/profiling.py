"""Tracing / profiling harness.

The reference has only ad-hoc wall timers (vc_infer_pipeline.py times[],
EpochRecorder). Here: an RTF-aware stage timer, jax.profiler trace capture
for TensorBoard, and a dispatch counter — the instrumentation used to
drive the round-1 optimization passes (see BASELINE.md gap analysis).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    """Accumulates wall time per named stage; reports RTF given audio secs."""

    times: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, audio_seconds: float | None = None) -> str:
        total = sum(self.times.values())
        lines = []
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            pct = 100 * t / total if total else 0
            lines.append(f"{name:24s} {t:8.3f}s {pct:5.1f}% (n={self.counts[name]})")
        if audio_seconds:
            lines.append(f"{'RTF':24s} {audio_seconds / max(total, 1e-9):8.2f}x")
        return "\n".join(lines)

    def to_json(self, audio_seconds: float | None = None) -> str:
        d = {"stages": dict(self.times), "counts": dict(self.counts)}
        if audio_seconds:
            d["rtf"] = audio_seconds / max(sum(self.times.values()), 1e-9)
        return json.dumps(d)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard (the reference
    has no profiler hooks at all; SURVEY §5)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class EpochRecorder:
    """Wall-clock per epoch (reference training_cli.py:76-86)."""

    def __init__(self):
        self.last = time.time()

    def record(self) -> str:
        now = time.time()
        elapsed = now - self.last
        self.last = now
        return time.strftime("[%Y-%m-%d %H:%M:%S]") + f" | ({elapsed:.1f}s/epoch)"
