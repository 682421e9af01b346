"""Per-stage timing + run logging.

Capability parity with the reference's ad-hoc observability
(reference: omp_get_wtime() spans around pipeline stages,
laser_mapping.cpp:54-55,159-169,250-253; per-scan rows buffered and dumped
to Log/class_fast_livo_time_log.csv at shutdown :308-326; VIO stage prints
lidar_selection.cpp:1048-1070) — plus what it lacks: percentile summaries
and a context-manager API. For kernel-level profiles use
`jax.profiler.trace` around the hot loop (the TPU equivalent of the
roofline counters SURVEY.md section 5 calls for).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


class StageTimer:
    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)
        self._rows: List[Dict[str, float]] = []
        self._current: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.samples[name].append(dt)
            self._current[name] = self._current.get(name, 0.0) + dt

    def tick(self, stamp: float):
        """Close one per-scan row (a Log/*.csv line in the reference)."""
        row = {"stamp": stamp, **self._current}
        self._rows.append(row)
        self._current = {}

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self.samples.items():
            a = np.asarray(v)
            out[k] = {
                "n": len(a),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "max_ms": float(a.max() * 1e3),
            }
        return out

    def write_csv(self, path: str):
        keys = ["stamp"] + sorted(
            {k for r in self._rows for k in r if k != "stamp"}
        )
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for r in self._rows:
                f.write(",".join(f"{r.get(k, 0.0):.6f}" for k in keys) + "\n")

    def report(self) -> str:
        lines = [f"{'stage':24s} {'n':>6s} {'mean':>9s} {'p50':>9s} {'p95':>9s} {'max':>9s}"]
        for k, s in sorted(self.summary().items()):
            lines.append(
                f"{k:24s} {s['n']:6d} {s['mean_ms']:8.2f}m {s['p50_ms']:8.2f}m "
                f"{s['p95_ms']:8.2f}m {s['max_ms']:8.2f}m"
            )
        return "\n".join(lines)
