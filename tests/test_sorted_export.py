"""Range-partitioned sorted export (materialize_sorted_range):
global ordering, dedup, range lineage, resume skip."""

import json
import os
import shutil

import pyarrow as pa

from lamapi_ray.pipelines.materialize import materialize_sorted_range
from lamapi_ray.state import checkpoint


def _triples(n=200):
    subj = [f"Q{i % 37:04d}" for i in range(n)]
    pred = [f"P{i % 5}" for i in range(n)]
    obj = [f"Q{(i * 7) % 23:04d}" for i in range(n)]
    # inject duplicates
    return pa.table(
        {
            "subj": pa.array(subj + subj[:20], pa.string()),
            "pred": pa.array(pred + pred[:20], pa.string()),
            "obj": pa.array(obj + obj[:20], pa.string()),
        }
    )


def test_sorted_export_global_order_and_dedup(ray_session, tmp_path):
    root = str(tmp_path / "sorted")
    tbl = _triples()
    res = materialize_sorted_range(tbl, root, num_partitions=5)
    out = checkpoint.read_output(root)
    rows = list(
        zip(out["subj"].to_pylist(), out["pred"].to_pylist(), out["obj"].to_pylist())
    )
    # globally sorted across partition boundaries, exactly deduped
    assert rows == sorted(set(zip(
        tbl["subj"].to_pylist(), tbl["pred"].to_pylist(), tbl["obj"].to_pylist()
    )))
    assert res["rows"] == len(rows)
    # manifests carry non-overlapping key ranges in partition order
    ranges = []
    for p in range(5):
        with open(os.path.join(checkpoint.partition_dir(root, str(p)),
                               checkpoint.MANIFEST)) as f:
            m = json.load(f)
        lo, hi = m["lineage"]["range_lo"], m["lineage"]["range_hi"]
        if lo is not None:
            assert lo <= hi
            ranges.append((lo, hi))
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_sorted_export_resume_skips_committed(ray_session, tmp_path):
    root = str(tmp_path / "resume")
    tbl = _triples(80)
    first = materialize_sorted_range(tbl, root, num_partitions=4)
    assert sorted(first["computed"]) == ["0", "1", "2", "3"]
    again = materialize_sorted_range(tbl, root, num_partitions=4)
    assert again["computed"] == []
    assert sorted(again["skipped"]) == ["0", "1", "2", "3"]
    # partial wipe → only the wiped partition recomputes
    shutil.rmtree(checkpoint.partition_dir(root, "2"))
    third = materialize_sorted_range(tbl, root, num_partitions=4)
    assert third["computed"] == ["2"]
    out = checkpoint.read_output(root)
    assert out.num_rows == first["rows"]
