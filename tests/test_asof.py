"""AS-OF join operator (stages/asof.py)."""

import datetime as dt

import pyarrow as pa
import ray.data

from lamapi_ray.stages.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _ds(rows, cols):
    return ray.data.from_arrow(
        pa.table({c: pa.array([r[i] for r in rows], t) for i, (c, t) in enumerate(cols)})
    )


COLS_L = [("event_id", pa.int64()), ("user_id", pa.int64()),
          ("ts", pa.timestamp("us")), ("value", pa.float64())]
COLS_R = COLS_L


def test_asof_basic_prior_equal_and_missing():
    left = _ds(
        [
            (10, 1, _ts(5), 1.0),   # prior click at minute 3
            (11, 1, _ts(2), 2.0),   # no prior click
            (12, 2, _ts(9), 3.0),   # equal-ts click counts (<=)
            (13, 3, _ts(9), 4.0),   # user with no clicks at all
        ],
        COLS_L,
    )
    right = _ds(
        [
            (100, 1, _ts(3), 7.5),
            (101, 1, _ts(6), 8.5),  # later than left 10 — must not match
            (102, 2, _ts(9), 9.5),
        ],
        COLS_R,
    )
    out = (
        pa.concat_tables(
            asof_join(
                left, right, by="user_id", ts="ts", tiebreak="event_id",
                right_payload={"event_id": "r_id", "ts": "r_ts", "value": "r_value"},
            ).iter_batches(batch_format="pyarrow", batch_size=4096)
        )
        .sort_by("event_id")
        .to_pydict()
    )
    assert out["event_id"] == [10, 11, 12, 13]
    assert out["r_id"] == [100, None, 102, None]
    assert out["r_value"] == [7.5, None, 9.5, None]


def test_asof_tie_takes_largest_tiebreak():
    left = _ds([(1, 7, _ts(4), 0.0)], COLS_L)
    right = _ds(
        [(50, 7, _ts(4), 1.0), (51, 7, _ts(4), 2.0), (49, 7, _ts(3), 3.0)],
        COLS_R,
    )
    out = pa.concat_tables(
        asof_join(
            left, right, by="user_id", ts="ts", tiebreak="event_id",
            right_payload={"event_id": "r_id"},
        ).iter_batches(batch_format="pyarrow", batch_size=4096)
    ).to_pydict()
    assert out["r_id"] == [51]


def test_asof_matches_naive_on_random_events():
    import numpy as np

    rng = np.random.default_rng(11)
    n = 400
    rows = [
        (
            i,
            int(rng.integers(0, 12)),
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(rng.integers(0, 5000))),
            float(i),
        )
        for i in range(n)
    ]
    lrows = rows[: n // 2]
    rrows = rows[n // 2 :]
    out = (
        pa.concat_tables(
            asof_join(
                _ds(lrows, COLS_L), _ds(rrows, COLS_R),
                by="user_id", ts="ts", tiebreak="event_id",
                right_payload={"event_id": "r_id"},
            ).iter_batches(batch_format="pyarrow", batch_size=4096)
        )
        .sort_by("event_id")
        .to_pydict()
    )
    naive = {}
    for eid, u, ts, _v in lrows:
        cands = [(r[2], r[0]) for r in rrows if r[1] == u and r[2] <= ts]
        naive[eid] = max(cands)[1] if cands else None
    assert out["r_id"] == [naive[e] for e in out["event_id"]]


def test_range_count_join_window_semantics():
    from lamapi_ray.stages.asof import range_count_join

    left = _ds([(1, 5, _ts(30), 0.0)], COLS_L)
    right = _ds(
        [
            (90, 5, _ts(0), 0.0),    # exactly 30 min before -> OUTSIDE (half-open)
            (91, 5, _ts(1), 0.0),    # inside
            (92, 5, _ts(30), 0.0),   # equal ts -> inside (<=)
            (93, 5, _ts(31), 0.0),   # after -> outside
            (94, 6, _ts(29), 0.0),   # other user
        ],
        COLS_R,
    )
    out = pa.concat_tables(
        range_count_join(
            left, right.map_batches(
                lambda t: t.select(["user_id", "ts"]), batch_format="pyarrow"
            ),
            by="user_id", ts="ts", window_us=30 * 60 * 1_000_000,
        ).iter_batches(batch_format="pyarrow", batch_size=1024)
    ).to_pydict()
    assert out["n_in_window"] == [2]
