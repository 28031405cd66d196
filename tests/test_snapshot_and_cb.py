"""Snapshot newest-complete-wins resolution + Crunchbase ingest tests."""

import json
import os

import pyarrow as pa
import pytest

from lamapi_ray.state.checkpoint import (
    SUCCESS,
    resolve_snapshot,
    run_partitioned,
)

SF = "/root/testdata/sf0.001"


def _mk_snapshot(base, date, complete=True):
    root = os.path.join(base, f"kg_snapshot={date}")
    os.makedirs(root, exist_ok=True)
    if complete:
        with open(os.path.join(root, SUCCESS), "w") as f:
            json.dump({"partitions": 0, "partition_ids": [], "rows": 0}, f)
    return root


def test_resolve_snapshot_newest_complete_wins(tmp_path):
    base = str(tmp_path)
    _mk_snapshot(base, "2026-01-01")
    want = _mk_snapshot(base, "2026-02-01")
    _mk_snapshot(base, "2026-03-01", complete=False)  # in-progress: invisible
    assert resolve_snapshot(base) == want


def test_resolve_snapshot_empty_and_missing(tmp_path):
    assert resolve_snapshot(str(tmp_path)) is None
    assert resolve_snapshot(str(tmp_path / "nope")) is None
    _mk_snapshot(str(tmp_path), "2026-01-01", complete=False)
    assert resolve_snapshot(str(tmp_path)) is None


def test_read_output_ignores_stale_partitions(tmp_path):
    """Rerunning with fewer partitions must not resurrect stale part dirs."""
    from lamapi_ray.state.checkpoint import read_output

    root = str(tmp_path / "out")
    tbl = pa.table({"x": pa.array([1, 2], pa.int64())})
    run_partitioned(root, ["0", "1", "2"], lambda p: (tbl, {}, {}))
    assert read_output(root).num_rows == 6
    # second run with a coarser partitioning leaves part=2 stale on disk
    run_partitioned(root, ["0", "1"], lambda p: (tbl, {}, {}), resume=False)
    assert read_output(root).num_rows == 4


def test_cb_tables_skip_and_classify(ray_session):
    from lamapi_ray.sources.crunchbase import cb_tables

    t = cb_tables(SF)
    items, lits = t["items"], t["literals"]
    ents = items["entity"].to_pylist()
    # skip path: every 97th customer has an empty permalink
    assert not any(e == "org-0" for e in ents) or True  # custkey may start at 1
    assert all(e.startswith("org-") for e in ents)
    custkeys = {int(e.split("-")[1]) for e in ents}
    assert all(k % 97 != 0 for k in custkeys)
    assert set(items["NERtype"].to_pylist()) == {"ORG"}
    # M11 classification routed per column
    by_col = {}
    for c, d in zip(lits["column"].to_pylist(), lits["datatype"].to_pylist()):
        by_col.setdefault(c, set()).add(d)
    assert by_col == {
        "founded_on": {"DATETIME"},
        "employees": {"NUMBER"},
        "segment": {"STRING"},
    }


def test_gc_snapshots_retention_and_safety(tmp_path):
    import os

    from lamapi_ray.state.checkpoint import (
        SNAPSHOT_PREFIX,
        SUCCESS,
        gc_snapshots,
        resolve_snapshot,
    )

    base = str(tmp_path)

    def mk(date, complete):
        d = os.path.join(base, f"{SNAPSHOT_PREFIX}{date}")
        os.makedirs(d)
        with open(os.path.join(d, "part.manifest"), "w") as f:
            f.write("{}")
        if complete:
            with open(os.path.join(d, SUCCESS), "w") as f:
                f.write("{}")
        return os.path.basename(d)

    a = mk("2024-01-01", True)
    b = mk("2024-01-02", True)
    c = mk("2024-01-03", True)
    torn = mk("2024-01-02-retry", False)   # old torn run
    inflight = mk("2024-01-04", False)     # writer ahead of newest complete

    # default: keep 2 newest complete, never touch incomplete
    out = gc_snapshots(base, keep=2)
    assert out["deleted"] == [a]
    assert set(out["kept"]) == {b, c, torn, inflight}
    assert resolve_snapshot(base).endswith(c)

    # drop_incomplete removes the old torn run but NOT the in-flight one
    out2 = gc_snapshots(base, keep=2, drop_incomplete=True)
    assert out2["deleted"] == [torn]
    assert set(out2["kept"]) == {b, c, inflight}

    # idempotent re-run deletes nothing further
    out3 = gc_snapshots(base, keep=2, drop_incomplete=True)
    assert out3["deleted"] == []
    # resolution unchanged throughout
    assert resolve_snapshot(base).endswith(c)


def test_gc_snapshots_empty_and_missing_dir(tmp_path):
    from lamapi_ray.state.checkpoint import gc_snapshots

    assert gc_snapshots(str(tmp_path / "nope")) == {"kept": [], "deleted": []}
    assert gc_snapshots(str(tmp_path)) == {"kept": [], "deleted": []}


def test_kg_fusion_cb_only_branch(ray_session):
    import pyarrow as pa

    from lamapi_ray.pipelines.extras import kg_fusion
    from lamapi_ray.sources.crunchbase import cb_tables

    sf = "/root/testdata/sf0.001"
    cb = cb_tables(sf)["items"]
    # items table sharing NO label with CB → every CB row must surface
    # under its own id with source='cb'; items rows pass through as 'wd'
    items = pa.table(
        {
            "entity": pa.array(["Q1", "Q2"], pa.string()),
            "label": pa.array(["zzz only in wd", "yyy only in wd"], pa.string()),
            "description": pa.array(["d1", "d2"], pa.string()),
            "popularity": pa.array([5, 6], pa.int64()),
        }
    )
    out = kg_fusion(sf, items)
    import collections

    src = collections.Counter(out["source"].to_pylist())
    assert src["wd"] == 2
    assert src["both"] == 0
    assert src["cb"] == cb.num_rows
    # and the matched branch with a shared label: CB desc + max popularity win
    one_label = cb["label"][0].as_py()
    items2 = pa.table(
        {
            "entity": pa.array(["Q9"], pa.string()),
            "label": pa.array([one_label], pa.string()),
            "description": pa.array(["wd desc"], pa.string()),
            "popularity": pa.array([1_000_000], pa.int64()),
        }
    )
    out2 = kg_fusion(sf, items2)
    both = out2.filter(
        pa.compute.equal(out2["source"], "both")
    )
    assert both.num_rows == 1
    assert both["entity"][0].as_py() == "Q9"
    assert both["description"][0].as_py() == cb["description"][0].as_py()
    assert both["popularity"][0].as_py() == 1_000_000
