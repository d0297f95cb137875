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


def analyze_trace(logdir: str, top: int = 25) -> Dict[str, object]:
    """Attribute device time in a captured trace to Python source lines.

    Parses the perfetto `*.trace.json.gz` that `trace()`/`jax.profiler`
    writes under `logdir/plugins/profile/<ts>/` — no TensorBoard needed
    (this box has no UI; gzip+json is enough because XLA embeds each op's
    `source` file:line and `long_name` HLO in the event args).

    Returns {"total_s", "loops": [(hlo_while_name, s)], "by_source":
    [(file:line, s, count)]}. `by_source` sums LEAF ops only (nested
    `while` wrappers excluded, so lines sum to the module time). This is
    the tool that found the round-2 rollout hotspot: a one-hot frame write
    at 32 GB/s that was 40% of the scan (docs/performance.md).
    """
    import collections
    import glob
    import gzip
    import json
    import os

    paths = sorted(
        glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    ops_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Ops"
        and e["pid"] in dev_pids
    }
    ops = [
        e
        for e in events
        if e.get("ph") == "X" and (e["pid"], e.get("tid")) in ops_tids
    ]
    loops = collections.Counter()
    by_src = collections.Counter()
    n_src = collections.Counter()
    total = 0.0
    for e in ops:
        if e["name"].split(".")[0] == "while":
            loops[e["name"]] += e["dur"]
            continue  # wrapper: children are separate events
        total += e["dur"]
        src = e.get("args", {}).get("source", "<unattributed>")
        by_src[src] += e["dur"]
        n_src[src] += 1
    return {
        "total_s": total / 1e6,
        "loops": [(k, v / 1e6) for k, v in loops.most_common()],
        "by_source": [
            (src, dur / 1e6, n_src[src]) for src, dur in by_src.most_common(top)
        ],
    }


def format_trace_report(report: Dict[str, object]) -> str:
    lines = [f"device time (leaf ops): {report['total_s']:.4f} s"]
    if report["loops"]:
        lines.append("scan/while loops (inclusive):")
        for name, s in report["loops"][:6]:
            lines.append(f"  {s*1e3:9.2f} ms  {name}")
    lines.append("by source line (leaves):")
    for src, s, n in report["by_source"]:
        lines.append(f"  {s*1e3:9.2f} ms {n:6d}x  {src}")
    return "\n".join(lines)


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
