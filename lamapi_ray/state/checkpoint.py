"""Per-partition checkpointed output with lineage + metrics — resume support.

The reference has NO checkpointing: a crashed ``parse_wikidata_dump.py`` run
restarts from scratch, and the only visibility marker is the ``status:
"DOING"`` metadata document (api/model/database.py:22-24). This module is the
explicit scale-path replacement (SURVEY §4 "Checkpoint / resume" row):

* Output is partitioned Parquet: one directory per deterministic partition id
  (e.g. one per input shard / key range) — never one giant file.
* Each completed partition writes a ``manifest.json`` AFTER its data file —
  lineage (input description, stage versions), row counts, wall time, and
  caller-supplied per-stage metrics (mentions/sec, candidate fan-out, …).
* A run-level ``_SUCCESS`` marker replaces the reference's ``status`` gate:
  a snapshot directory is readable iff ``_SUCCESS`` exists (same visibility
  semantics as database.py:22-36's newest-complete-snapshot rule).
* ``resume``: partitions whose manifest is complete are SKIPPED; everything
  else is (re)computed. Writes go to a temp file then ``os.replace`` — a
  partition is either fully present with manifest or not counted.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "manifest.json"
SUCCESS = "_SUCCESS"


def partition_dir(root: str, part_id: str) -> str:
    return os.path.join(root, f"part={part_id}")


def is_complete(root: str, part_id: str) -> bool:
    return os.path.exists(os.path.join(partition_dir(root, part_id), MANIFEST))


def completed_partitions(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("part=") and os.path.exists(
            os.path.join(root, name, MANIFEST)
        ):
            out.append(name[len("part=") :])
    return out


def write_partition(
    root: str,
    part_id: str,
    table: pa.Table,
    lineage: dict | None = None,
    metrics: dict | None = None,
) -> dict:
    """Atomically write one partition: data file, then manifest.

    The manifest is the commit record — a crash between the two leaves a
    data file without manifest, which ``resume`` treats as incomplete and
    recomputes (idempotent: the rewrite replaces the orphan)."""
    pdir = partition_dir(root, part_id)
    os.makedirs(pdir, exist_ok=True)
    t0 = time.time()
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(pdir, "data.parquet"))
    manifest = {
        "partition": part_id,
        "rows": table.num_rows,
        "columns": table.column_names,
        "bytes": table.nbytes,
        "wall_sec": round(time.time() - t0, 4),
        "lineage": lineage or {},
        "metrics": metrics or {},
    }
    tmp_m = os.path.join(pdir, ".manifest.tmp")
    with open(tmp_m, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp_m, os.path.join(pdir, MANIFEST))
    return manifest


def run_partitioned(
    root: str,
    partitions: list[str],
    compute: Callable[[str], tuple[pa.Table, dict, dict]],
    resume: bool = True,
) -> dict:
    """Execute ``compute(part_id) -> (table, lineage, metrics)`` for every
    partition not already complete; finish with the ``_SUCCESS`` marker.

    Returns ``{"computed": [...], "skipped": [...], "rows": N}``. The
    partition list and ids must be deterministic across runs — that is what
    makes skip-on-resume correct."""
    computed, skipped, total_rows = [], [], 0
    for part_id in partitions:
        if resume and is_complete(root, part_id):
            skipped.append(part_id)
            with open(os.path.join(partition_dir(root, part_id), MANIFEST)) as f:
                total_rows += json.load(f)["rows"]
            continue
        table, lineage, metrics = compute(part_id)
        m = write_partition(root, part_id, table, lineage, metrics)
        total_rows += m["rows"]
        computed.append(part_id)
    # _SUCCESS records the EXACT partition id list of this run — read_output
    # reads precisely these, so stale part= dirs left by an earlier run with
    # a different partitioning (e.g. more buckets) are never silently merged
    # into the result.
    with open(os.path.join(root, SUCCESS), "w") as f:
        json.dump(
            {
                "partitions": len(partitions),
                "partition_ids": list(partitions),
                "rows": total_rows,
            },
            f,
        )
    return {"computed": computed, "skipped": skipped, "rows": total_rows}


SNAPSHOT_PREFIX = "kg_snapshot="


def resolve_snapshot(base_dir: str) -> str | None:
    """Newest COMPLETE dated snapshot root under ``base_dir``, or None.

    Mirrors the reference's snapshot-visibility rule
    (api/model/database.py:18-36): per-snapshot databases named by date,
    an in-progress snapshot (``status: "DOING"`` there, a missing
    ``_SUCCESS`` here) is invisible, and the newest completed date wins.
    Dates are ISO (``kg_snapshot=YYYY-MM-DD``) rather than the reference's
    ``DDMMYYYY`` so lexicographic and chronological order coincide; any
    suffix after the date (e.g. ``-2``) breaks ties lexicographically."""
    if not os.path.isdir(base_dir):
        return None
    best = None
    for name in sorted(os.listdir(base_dir)):
        if not name.startswith(SNAPSHOT_PREFIX):
            continue
        if not os.path.exists(os.path.join(base_dir, name, SUCCESS)):
            continue  # in-progress or torn — invisible
        key = name[len(SNAPSHOT_PREFIX) :]
        if best is None or key > best[0]:
            best = (key, name)
    return os.path.join(base_dir, best[1]) if best else None


def read_output(root: str) -> pa.Table:
    """Read a completed partitioned output (requires the _SUCCESS marker).

    Reads exactly the partition set recorded in ``_SUCCESS``; a recorded
    partition without a manifest is an error (torn snapshot), and extra
    ``part=`` directories on disk (stale leftovers from a differently
    partitioned earlier run) are ignored."""
    success_path = os.path.join(root, SUCCESS)
    if not os.path.exists(success_path):
        raise FileNotFoundError(f"no _SUCCESS marker under {root}")
    with open(success_path) as f:
        record = json.load(f)
    parts = record.get("partition_ids")
    if parts is None:  # legacy marker without the id list
        parts = completed_partitions(root)
    missing = [p for p in parts if not is_complete(root, p)]
    if missing:
        raise FileNotFoundError(
            f"_SUCCESS lists partitions with no manifest under {root}: {missing}"
        )
    return pa.concat_tables(
        pq.read_table(os.path.join(partition_dir(root, p), "data.parquet"))
        for p in parts
    )


def gc_snapshots(
    base_dir: str, keep: int = 2, drop_incomplete: bool = False
) -> dict[str, list[str]]:
    """Snapshot garbage collection — the retention step of the dated
    snapshot layout (reference database.py:18-36 keeps every per-date
    database forever; a production job prunes).

    Keeps the newest ``keep`` COMPLETE snapshots; older complete ones
    are deleted. Incomplete snapshots (no ``_SUCCESS``) are kept by
    default — they may be a writer mid-run (the batch analogue of the
    reference's ``status: "DOING"``); pass ``drop_incomplete=True`` for
    the post-crash cleanup mode that removes torn runs too, EXCEPT any
    incomplete snapshot newer than the newest complete one (that is the
    in-flight writer).

    Deletion order is oldest-first and each directory is removed
    ``_SUCCESS``-marker-first, so a GC crash can only ever leave a
    snapshot that readers already treat as invisible — the operation is
    safe to re-run (idempotent) and never races ``resolve_snapshot``.

    → {"kept": [...], "deleted": [...]} (directory names, sorted).
    """
    if not os.path.isdir(base_dir):
        return {"kept": [], "deleted": []}
    complete: list[str] = []
    incomplete: list[str] = []
    for name in sorted(os.listdir(base_dir)):
        if not name.startswith(SNAPSHOT_PREFIX):
            continue
        if os.path.exists(os.path.join(base_dir, name, SUCCESS)):
            complete.append(name)
        else:
            incomplete.append(name)
    complete.sort(key=lambda n: n[len(SNAPSHOT_PREFIX) :])
    keep_set = set(complete[-keep:]) if keep > 0 else set()
    newest_complete = complete[-1][len(SNAPSHOT_PREFIX) :] if complete else ""
    deleted: list[str] = []
    for name in complete:
        if name in keep_set:
            continue
        _delete_snapshot(base_dir, name)
        deleted.append(name)
    if drop_incomplete:
        for name in incomplete:
            if name[len(SNAPSHOT_PREFIX) :] > newest_complete:
                continue  # in-flight writer ahead of the newest complete
            _delete_snapshot(base_dir, name)
            deleted.append(name)
    kept = sorted(set(complete) - set(deleted)) + sorted(
        set(incomplete) - set(deleted)
    )
    return {"kept": sorted(kept), "deleted": sorted(deleted)}


def _delete_snapshot(base_dir: str, name: str) -> None:
    import shutil

    root = os.path.join(base_dir, name)
    marker = os.path.join(root, SUCCESS)
    if os.path.exists(marker):
        os.remove(marker)  # readers see it as invisible from here on
    shutil.rmtree(root)
