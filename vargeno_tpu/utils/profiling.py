"""Tracing / profiling / metrics.

The reference's only instrumentation is a clock() pair around geno and
DEBUG-gated read counters (SURVEY.md §5). Here:

- ``trace(dir)``: context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto.
- ``StageTimer``: wall-time per named stage with device sync, for quick
  breakdowns without a full trace.
- ``Meter``: throughput counter (reads/sec, batches/sec) with jsonl export,
  the structured replacement for the reference's DEBUG printf block
  (src/qv.cc:1753-1773).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if self.sync and block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total:9.3f}s  x{n:<6d} "
                         f"{1e3*total/max(n,1):8.2f} ms/call")
        return "\n".join(lines)


class Meter:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.t0 = time.time()
        self.reads = 0
        self.batches = 0
        self.extra: Dict[str, int] = {}

    def bump(self, reads: int, **counters) -> None:
        self.reads += reads
        self.batches += 1
        for k, v in counters.items():
            self.extra[k] = self.extra.get(k, 0) + int(v)

    def snapshot(self) -> dict:
        dt = max(time.time() - self.t0, 1e-9)
        d = dict(reads=self.reads, batches=self.batches,
                 elapsed_s=round(dt, 3),
                 reads_per_sec=round(self.reads / dt, 1))
        d.update(self.extra)
        return d

    def emit(self) -> dict:
        snap = self.snapshot()
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(snap) + "\n")
        return snap
