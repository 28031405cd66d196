"""Per-stage run metrics (north-rule requirement): mentions/sec,
link-score latency, candidate fan-out.

A single zero-cpu session-cached actor accumulates (rows_in, rows_out,
busy_sec) per stage; batch wrappers report fire-and-forget (one
``.remote`` per batch, no ray.get in the hot path). ``derived`` turns the
raw counters into the named rates. The actor is keyed per run token so
concurrent runs in one session never mix.
"""

from __future__ import annotations

import itertools
import time

import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class _StageMetricsActor:
    def __init__(self):
        self._d: dict = {}

    def add(self, key, stage: str, rows_in: int, rows_out: int, busy_s: float):
        e = self._d.setdefault((key, stage), [0, 0, 0.0])
        e[0] += rows_in
        e[1] += rows_out
        e[2] += busy_s

    def snapshot(self, key):
        return {
            stage: tuple(v) for (k, stage), v in self._d.items() if k == key
        }


_SLOT: list = [None]
_RUN_SEQ = itertools.count()


def metrics_actor():
    """Session-cached zero-cpu actor (same reuse pattern as the CC
    convergence counter — actor spawn costs ~130 ms)."""
    a = _SLOT[0]
    if a is not None:
        try:
            ray.get(a.snapshot.remote(-1))
            return a
        except Exception:
            _SLOT[0] = None
    a = _StageMetricsActor.remote()
    _SLOT[0] = a
    return a


def new_run_key() -> int:
    return next(_RUN_SEQ)


def meter(fn, stage: str, actor, key, out_rows=None):
    """Wrap a per-batch callable to report (rows_in, rows_out, busy_sec).

    ``out_rows(out_table) -> int`` overrides the output row count (e.g.
    count MENTIONS inside list columns instead of page rows)."""

    def wrapped(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        out = fn(batch)
        n_out = out_rows(out) if out_rows is not None else len(out)
        actor.add.remote(key, stage, len(batch), int(n_out), time.perf_counter() - t0)
        return out

    return wrapped


def derived(snap: dict) -> dict:
    """Raw (rows_in, rows_out, busy_sec) per stage → the named rates.

    busy_sec is summed across workers, so rates are per-WORKER-second
    (throughput per core, stable across cluster sizes); wall-clock rates
    are the caller's wall time divided into the same counts."""
    out: dict = {"stages": {k: {"rows_in": v[0], "rows_out": v[1], "busy_sec": round(v[2], 4)} for k, v in snap.items()}}
    scan = snap.get("mention_scan")
    if scan and scan[2] > 0:
        out["mentions_per_worker_sec"] = round(scan[1] / scan[2], 1)
        out["pages_per_worker_sec"] = round(scan[0] / scan[2], 1)
    cand = snap.get("candidate_score")
    if cand:
        if cand[0] > 0:
            out["candidate_fan_out"] = round(cand[1] / cand[0], 2)
        if cand[2] > 0:
            out["link_score_latency_ms"] = round(1000.0 * cand[2] / max(cand[0], 1), 4)
    return out
