"""LSM postings compaction (index/postings.py::merge_postings)."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.index.postings import merge_postings


def _segments(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows], pa.int64()),
                "df": pa.array([len(r[1].split(",")) for r in rows], pa.int64()),
                "postings": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(2)


def _run(rows, deleted, min_df):
    batches = list(
        merge_postings(
            _segments(rows), np.array(deleted, np.int64), min_df=min_df
        ).iter_batches(batch_size=64, batch_format="pyarrow")
    )
    if not batches:
        return []
    t = pa.concat_tables(batches).sort_by("g")
    return list(
        zip(t["g"].to_pylist(), t["df"].to_pylist(), t["postings"].to_pylist())
    )


def test_union_dedup_tombstones_and_threshold(ray_session):
    rows = [
        (1, "1,2"),      # segment A
        (1, "2,5,9"),    # segment B overlaps doc 2 -> dedup
        (2, "3,4"),      # under min_df=3 in each segment...
        (2, "5"),        # ...but clears it after the union
        (3, "6,7,8"),    # doc 7 tombstoned -> df drops to 2 -> pruned
        (4, "9"),        # stays under threshold -> pruned
    ]
    got = _run(rows, deleted=[7], min_df=3)
    assert got == [(1, 4, "1,2,5,9"), (2, 3, "3,4,5")]


def test_tombstones_apply_to_every_segment(ray_session):
    rows = [(5, "1,2,3"), (5, "2,3,4")]
    got = _run(rows, deleted=[2, 3], min_df=1)
    assert got == [(5, 2, "1,4")]
    # deleting everything removes the term entirely
    assert _run(rows, deleted=[1, 2, 3, 4], min_df=1) == []
