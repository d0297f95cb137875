"""Tracing / profiling utilities.

The reference's only tracing is manual `torch.cuda.memory_allocated` prints
(reference: rovr/test.py:66,71) and tqdm bars; SURVEY.md §5 calls for
`jax.profiler` traces + per-step timing as the TPU-native replacement.

`trace(logdir)` wraps a region in a profiler trace viewable in
TensorBoard/XProf/Perfetto; `StepTimer` measures jitted-step wall time with
device synchronization and keeps a rolling summary.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Profile a region: `with trace("runs/prof"): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (shows up on the XProf timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock timing of device steps with a TRUE device sync.

    Usage:
        timer = StepTimer()
        with timer.step():
            out = train_step(...)
            timer.sync(out)
        print(timer.summary())
    """

    def __init__(self, skip_first: int = 1):
        self.times: List[float] = []
        self.skip_first = skip_first
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def sync(self, tree):
        # over the axon tunnel block_until_ready returns at enqueue; only a
        # device_get round-trip truly waits (docs/performance.md)
        from rovr_tpu.utils.transfer import tunnel_sync

        tunnel_sync(tree)

    @property
    def steady(self) -> List[float]:
        return self.times[self.skip_first:] if len(self.times) > self.skip_first \
            else self.times

    def summary(self) -> Dict[str, float]:
        ts = self.steady
        if not ts:
            return {}
        ts_sorted = sorted(ts)
        return {
            "steps": float(len(ts)),
            "mean_s": sum(ts) / len(ts),
            "p50_s": ts_sorted[len(ts) // 2],
            "max_s": ts_sorted[-1],
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device live memory (the analog of the reference's CUDA memory
    prints, test.py:66) — empty dict on backends without memory_stats."""
    out: Dict[str, float] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d.id)] = stats.get("bytes_in_use", 0) / 1e9
    return out
