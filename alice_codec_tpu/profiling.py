"""Per-stage timing and profiling hooks.

The reference ships no in-library tracing (SURVEY §5.1 — only criterion
micro-benchmarks and an ``encode_time_us`` field for the DB sink).  This
module provides the TPU-framework equivalent:

* :class:`StageTimer` — lightweight wall-clock stage accounting that feeds
  :class:`~alice_codec_tpu.bridges.db.CodecMetrics`-compatible records;
* :func:`trace` — context manager around ``jax.profiler`` for device-level
  traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    """Accumulates wall-clock time per named pipeline stage.

    >>> timer = StageTimer()
    >>> with timer.stage("encode"):
    ...     pass
    >>> "encode" in timer.totals
    True
    """

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def average_us(self, name: str) -> float:
        """Mean stage time in microseconds (CodecMetrics.encode_time_us units)."""
        n = self.counts.get(name, 0)
        return 0.0 if n == 0 else self.totals[name] / n * 1e6

    def as_metrics(self, name: str, *, timestamp_ms: int, bitrate_bps: float = 0.0,
                   psnr_db: float = 0.0):
        """Build a CodecMetrics record for the DB bridge sink."""
        from .bridges.db import CodecMetrics

        return CodecMetrics(
            timestamp_ms=timestamp_ms,
            bitrate_bps=bitrate_bps,
            psnr_db=psnr_db,
            encode_time_us=self.average_us(name),
        )

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name:24s} {self.totals[name]*1e3:10.2f} ms total"
                f"  ({self.counts[name]} calls, {self.average_us(name):10.1f} µs avg)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/alc_trace"):
    """Capture a device-level profiler trace (TensorBoard/XProf format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
