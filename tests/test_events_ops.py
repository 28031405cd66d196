"""Event-stream operators: nearest-rank percentiles + gap sessionization."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    tbl = pa.Table.from_pylist(rows).cast(
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("event_type", pa.string()), ("ts", pa.timestamp("us")),
             ("value", pa.float64())]
        )
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


def test_event_percentiles_nearest_rank(tmp_path):
    from lamapi_ray.pipelines import extras

    rows = [
        {"event_id": i, "user_id": 0, "event_type": "a",
         "ts": 1_000_000 * i, "value": float(v)}
        for i, v in enumerate([5.0, 1.0, 3.0, 2.0, 4.0])
    ]
    _write_events(tmp_path, rows)
    out = extras.event_percentiles(str(tmp_path))
    r = out.to_pylist()[0]
    # sorted values 1..5, n=5: p50 -> ceil(2.5)=3rd -> 3.0;
    # p95 -> ceil(4.75)=5th -> 5.0; p99 -> 5th -> 5.0
    assert r["n_events"] == 5 and r["p50"] == 3.0
    assert r["p95"] == 5.0 and r["p99"] == 5.0


def test_sessionize_gap_breaks(tmp_path):
    from lamapi_ray.pipelines import extras

    MIN = 60 * 1_000_000
    rows = []
    # user 1: 3 events close together, then a 31-min gap, then 2 events
    for i, t in enumerate([0, 5 * MIN, 10 * MIN, 41 * MIN, 45 * MIN]):
        rows.append({"event_id": i, "user_id": 1, "event_type": "a",
                     "ts": t, "value": 0.0})
    # user 2: single event
    rows.append({"event_id": 99, "user_id": 2, "event_type": "a",
                 "ts": 7 * MIN, "value": 0.0})
    _write_events(tmp_path, rows)
    out = extras.sessionize(str(tmp_path))
    got = [(r["user_id"], r["session_id"], r["n_events"]) for r in out.to_pylist()]
    assert got == [(1, 1, 3), (1, 2, 2), (2, 1, 1)]
    ts = {(r["user_id"], r["session_id"]): (r["start_ts"], r["end_ts"])
          for r in out.to_pylist()}
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    assert ts[(1, 2)] == (epoch + dt.timedelta(minutes=41),
                          epoch + dt.timedelta(minutes=45))


def test_sessionize_exact_30min_gap_same_session(tmp_path):
    # the break condition is STRICTLY greater than 30 min
    from lamapi_ray.pipelines import extras

    MIN = 60 * 1_000_000
    rows = [
        {"event_id": 0, "user_id": 1, "event_type": "a", "ts": 0, "value": 0.0},
        {"event_id": 1, "user_id": 1, "event_type": "a", "ts": 30 * MIN, "value": 0.0},
    ]
    _write_events(tmp_path, rows)
    out = extras.sessionize(str(tmp_path))
    assert [(r["session_id"], r["n_events"]) for r in out.to_pylist()] == [(1, 2)]


def test_embedding_dup_clusters_transitive(tmp_path):
    # identical vectors chain into ONE component labeled by the min id
    from lamapi_ray.pipelines import extras

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    rows = [
        {"vec_id": 0, "embedding": v, "label": 0},
        {"vec_id": 1, "embedding": v, "label": 0},
        {"vec_id": 2, "embedding": v, "label": 0},
        {"vec_id": 3, "embedding": w, "label": 1},
    ]
    tbl = pa.Table.from_pylist(rows).cast(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float32())),
                   ("label", pa.int32())])
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = extras.embedding_dup_clusters(str(tmp_path))
    got = {r["vec_id"]: r["cluster"] for r in out.to_pylist()}
    # _dup_embeddings injects a shifted copy of vec_id 0 -> 1000000
    assert got[0] == got[1] == got[2] == 0
    assert got[1000000] == 0  # the injected copy of v0 joins the component
    assert got[3] == 3  # singleton keeps its own id


def test_sliding_window_fanout_covers_exactly_four_windows(sf_dir):
    import pyarrow as pa

    from lamapi_ray.pipelines.extras import sliding_window_events, window_events

    sw = sliding_window_events(sf_dir)
    # every event contributes to 4 windows (minus epoch clipping)
    hw = window_events(sf_dir)
    assert sum(sw["n_events"].to_pylist()) <= 4 * sum(hw["n_events"].to_pylist())
    assert sum(sw["n_events"].to_pylist()) > 3 * sum(hw["n_events"].to_pylist())
    # each hour window's count equals the sum of its aligned hop? no — just
    # check the hour-aligned hopping windows agree with the tumbling hour
    # counts on total cents mass ×4 (every event counted 4 times, no clip
    # in this dataset because ts starts 2024)
    assert sum(sw["sum_value_cents"].to_pylist()) == 4 * sum(
        hw["sum_value_cents"].to_pylist()
    )


def test_user_top_events_is_per_user_topk(sf_dir):
    from collections import Counter

    from lamapi_ray.pipelines.extras import user_top_events

    out = user_top_events(sf_dir)
    per_user = Counter(out["user_id"].to_pylist())
    assert max(per_user.values()) <= 3
    rows = out.to_pylist()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        vals = [(-r["value_cents"], r["event_id"]) for r in rs]
        assert vals == sorted(vals)


def test_running_user_totals_monotone_per_user(sf_dir):
    from lamapi_ray.pipelines.extras import running_user_totals

    out = running_user_totals(sf_dir)
    assert out.num_rows > 0
    rows = out.to_pylist()
    # per user: running_n is 1..k, each event's running sum >= its count
    # (values positive in this dataset)
    last_n = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["running_n"])):
        u = r["user_id"]
        assert r["running_n"] == last_n.get(u, 0) + 1
        last_n[u] = r["running_n"]
        assert r["running_cents"] >= 0


def test_stratified_sample_bottomk_matches_bruteforce(sf_dir):
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import stratified_sample
    from lamapi_ray.stages.sketch import _hash_ids

    out = stratified_sample(sf_dir)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "event_type"])
    eid = ev["event_id"].to_numpy().astype(np.int64)
    et = np.asarray(ev["event_type"].to_pylist(), dtype=object)
    h = _hash_ids(eid).astype(np.int64)
    for t in np.unique(et):
        m = et == t
        order = np.lexsort((eid[m], h[m]))
        want = eid[m][order][:20].tolist()
        got_rows = out.filter(
            pa.compute.equal(out["event_type"], str(t))
        ).sort_by("sample_rank")
        assert got_rows["event_id"].to_pylist() == want
        assert got_rows["sample_rank"].to_pylist() == list(
            range(1, len(want) + 1)
        )
    # sample is a deterministic function of ids: stable across re-runs
    again = stratified_sample(sf_dir)
    assert out.equals(again)


def test_bottomk_sample_stable_under_corpus_growth(tmp_path, ray_session):
    # the docstring's stability claim: growing the corpus only ever
    # DISPLACES sample members from the bottom (never reorders survivors),
    # because membership is "k smallest hashes" — verify on two nested
    # corpora through the real operator
    from lamapi_ray.pipelines.extras import stratified_sample

    base = [
        {"event_id": i, "user_id": i % 7, "event_type": "click",
         "ts": 1_700_000_000_000_000 + i, "value": float(i)}
        for i in range(200)
    ]
    _write_events(tmp_path, base)
    small = stratified_sample(str(tmp_path))
    grown_dir = tmp_path / "grown"
    grown_dir.mkdir()
    _write_events(
        grown_dir,
        base + [
            {"event_id": 10_000 + i, "user_id": 1, "event_type": "click",
             "ts": 1_700_009_000_000_000 + i, "value": 0.0}
            for i in range(300)
        ],
    )
    big = stratified_sample(str(grown_dir))
    small_ids = small["event_id"].to_pylist()
    big_ids = big["event_id"].to_pylist()
    # survivors keep their relative order (subsequence property)
    surv = [e for e in small_ids if e in set(big_ids)]
    it = iter(big_ids)
    assert all(e in it for e in surv)


def test_events_rollup_rejects_unknown_event_type(tmp_path, ray_session):
    from lamapi_ray.pipelines import extras

    rows = [
        {"event_id": 0, "user_id": 0, "event_type": "click",
         "ts": 1_000_000, "value": 1.0},
        {"event_id": 1, "user_id": 0, "event_type": "zzz_not_a_type",
         "ts": 2_000_000, "value": 1.0},
    ]
    _write_events(tmp_path, rows)
    import pytest
    import ray.exceptions

    with pytest.raises(
        (ValueError, ray.exceptions.RayTaskError), match="event_type"
    ):
        extras.events_rollup(str(tmp_path))


def test_revenue_by_nation_rejects_dangling_custkey(tmp_path, ray_session):
    import pyarrow.parquet as pq
    import pytest
    import ray.exceptions

    from lamapi_ray.pipelines import extras

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                  "c_nationkey": pa.array([0, 0], pa.int64())}),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0], pa.int64()),
                  "n_name": pa.array(["X"], pa.string())}),
        tmp_path / "nation.parquet",
    )
    # o_custkey=9 is absent from customer; 9 > max(c_custkey) would also
    # IndexError unguarded — both must surface as a clear ValueError
    pq.write_table(
        pa.table({"o_orderkey": pa.array([10], pa.int64()),
                  "o_custkey": pa.array([9], pa.int64())}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([10], pa.int64()),
                  "l_extendedprice": pa.array([1.0], pa.float64()),
                  "l_discount": pa.array([0.0], pa.float64())}),
        tmp_path / "lineitem.parquet",
    )
    with pytest.raises(
        (ValueError, ray.exceptions.RayTaskError), match="customer"
    ):
        extras.revenue_by_nation(str(tmp_path))


def test_table_profile_ignores_nulls_in_minmax(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines import extras

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([5, None, 7], pa.int64()),
                "l_partkey": pa.array([1, 2, 3], pa.int64()),
                "l_suppkey": pa.array([None, None, 4], pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    out = {r["column"]: r for r in extras.table_profile(str(tmp_path)).to_pylist()}
    assert out["l_orderkey"]["n_nulls"] == 1
    assert out["l_orderkey"]["min_v"] == 5 and out["l_orderkey"]["max_v"] == 7
    assert out["l_orderkey"]["n_distinct"] == 2
    assert out["l_suppkey"]["n_nulls"] == 2
    assert out["l_suppkey"]["min_v"] == 4 and out["l_suppkey"]["max_v"] == 4
    assert out["l_suppkey"]["n_distinct"] == 1


def test_watermark_window_flags_planted_stragglers(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import watermark_window

    us = 1_000_000
    hour = 3600 * us
    # 600 time-ordered events, 10s apart; every 50th arrives 500 positions
    # late — by then the watermark has advanced 500·10 s ≈ 83 min < 2 h,
    # so with this tight spacing NONE are late; stretch spacing to 30 min
    # for ids >= 300 so the second half's stragglers fall 250 h behind.
    n = 600
    eid = np.arange(n, dtype=np.int64)
    ts = np.where(eid < 300, eid * 10 * us, 300 * 10 * us + (eid - 300) * 30 * 60 * us)
    tbl = pa.table(
        {
            "event_id": pa.array(eid),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(eid % 7, pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(np.ones(n), pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = watermark_window(str(tmp_path))
    # naive reference
    arr = eid + np.where(eid % 50 == 0, 500, 0)
    order = np.lexsort((eid, arr))
    t_sorted = ts[order]
    wm = np.maximum.accumulate(t_sorted)
    late = t_sorted < wm - 2 * hour
    win = (t_sorted // hour) * hour
    import collections

    want = collections.defaultdict(lambda: [0, 0])
    for w, l in zip(win, late):
        want[int(w)][1 if l else 0] += 1
    got = {
        int(w): [int(o), int(l)]
        for w, o, l in zip(
            out["window_us"].to_pylist(),
            out["n_on_time"].to_pylist(),
            out["n_late"].to_pylist(),
        )
    }
    assert got == {k: v for k, v in want.items()}
    assert sum(l for _, l in got.values()) > 0  # stragglers actually flagged


def test_weighted_sample_matches_naive_and_favors_weight(ray_session, tmp_path):
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import weighted_sample

    n = 500
    eid = np.arange(n, dtype=np.int64)
    # one heavy row (id 7, weight 10000x) should almost surely be sampled
    value = np.where(eid == 7, 5000.0, 0.5)
    tbl = pa.table(
        {
            "event_id": pa.array(eid),
            "ts": pa.array(eid * 1_000_000, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(eid % 9, pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = weighted_sample(str(tmp_path), k=10)

    cents = np.rint(value * 100).astype(np.int64)
    h = (eid * 2654435761) % 1_000_000_007
    key = np.floor(
        -np.log((h + 1.0) / 1_000_000_008.0) / cents * 1_000_000_000_000
    ).astype(np.int64)
    order = np.lexsort((eid, key))[:10]
    assert got["event_id"].to_pylist() == eid[order].tolist()
    assert got["key_fp"].to_pylist() == key[order].tolist()
    assert 7 in got["event_id"].to_pylist()  # heavy row sampled


def test_mad_outliers_flags_planted_extremes(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import mad_outliers

    # type 'a': tight cluster around $1.00 with two planted extremes;
    # type 'b': all identical (MAD 0 → every deviation > 0 is an outlier)
    vals_a = [1.00, 1.01, 0.99, 1.02, 0.98, 1.00, 50.0, -0.0 + 40.0]
    vals_b = [2.0, 2.0, 2.0, 2.0]
    vals = vals_a + vals_b
    et = ["a"] * len(vals_a) + ["b"] * len(vals_b)
    n = len(vals)
    tbl = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array([i * 1_000_000 for i in range(n)], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = mad_outliers(str(tmp_path))
    rows = {
        t: (m, md, o)
        for t, m, md, o in zip(
            out["event_type"].to_pylist(),
            out["med_cents"].to_pylist(),
            out["mad_cents"].to_pylist(),
            out["n_outliers"].to_pylist(),
        )
    }
    # type a: cents sorted [98,99,100,100,101,102,4000,5000]; n=8 → 4th = 100
    # devs sorted [0,0,1,1,2,2,3900,4900] → MAD = 4th = 1; 3*MAD=3 → 2 outliers
    assert rows["a"] == (100, 1, 2)
    # type b: med 200, MAD 0, no deviations → 0 outliers
    assert rows["b"] == (200, 0, 0)


def test_retention_cohorts_matrix(tmp_path, ray_session):
    from lamapi_ray.pipelines import extras

    WEEK = extras.WEEK_US
    rows = []
    eid = 0

    def ev(uid, week):
        nonlocal eid
        rows.append({"event_id": eid, "user_id": uid, "event_type": "a",
                     "ts": week * WEEK + (eid % 7) * 1_000_000, "value": 0.0})
        eid += 1

    # cohort week 10: u1 active weeks 10,11,13 (11 twice — distinct weeks
    # count once); u2 active week 10 only
    ev(1, 10); ev(1, 11); ev(1, 11); ev(1, 13)
    ev(2, 10)
    # cohort week 11: u3 active weeks 11 and 13
    ev(3, 11); ev(3, 13)
    _write_events(tmp_path, rows)
    out = extras.retention_cohorts(str(tmp_path))
    cells = {
        (c, o): n
        for c, o, n in zip(
            out["cohort_week"].to_pylist(),
            out["week_offset"].to_pylist(),
            out["n_users"].to_pylist(),
        )
    }
    assert cells == {
        (10, 0): 2,  # u1 + u2 first seen week 10
        (10, 1): 1,  # u1 back at week 11
        (10, 3): 1,  # u1 back at week 13
        (11, 0): 1,  # u3 first seen week 11
        (11, 2): 1,  # u3 back at week 13
    }


def test_user_rfm_features_crafted(tmp_path, ray_session):
    from lamapi_ray.pipelines import extras

    DAY = 86_400_000_000
    rows = [
        # u1: 3 events over 2 days, one purchase, cents 150+250+100
        {"event_id": 0, "user_id": 1, "event_type": "view",
         "ts": 10 * DAY, "value": 1.5},
        {"event_id": 1, "user_id": 1, "event_type": "purchase",
         "ts": 10 * DAY + 5, "value": 2.5},
        {"event_id": 2, "user_id": 1, "event_type": "view",
         "ts": 12 * DAY, "value": 1.0},
        # u2: single event
        {"event_id": 3, "user_id": 2, "event_type": "click",
         "ts": 11 * DAY, "value": 0.0},
    ]
    _write_events(tmp_path, rows)
    out = extras.user_rfm_features(str(tmp_path))
    r = {row["user_id"]: row for row in out.to_pylist()}
    assert r[1]["n_events"] == 3 and r[1]["n_purchase"] == 1
    assert r[1]["sum_cents"] == 500 and r[1]["n_active_days"] == 2
    assert r[1]["last_ts"].timestamp() * 1e6 == 12 * DAY
    assert r[2]["n_events"] == 1 and r[2]["n_active_days"] == 1
    assert r[2]["sum_cents"] == 0 and r[2]["n_purchase"] == 0


def test_zorder_interleave_locality(tmp_path, ray_session):
    """Morton key round-trips and orders a 2x2 quadrant before the rest."""
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines import extras

    tbl = pa.table(
        {
            "l_orderkey": pa.array([0, 0, 1, 1, 2, 0], pa.int64()),
            "l_partkey": pa.array([0, 1, 0, 1, 0, 0], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    out = extras.zorder_layout(str(tmp_path))
    rows = list(zip(out["l_orderkey"].to_pylist(), out["l_partkey"].to_pylist(),
                    out["z"].to_pylist()))
    # distinct pairs only; z bits: (0,0)=0 (0,1)=1 (1,0)=2 (1,1)=3 (2,0)=8
    assert rows == [(0, 0, 0), (0, 1, 1), (1, 0, 2), (1, 1, 3), (2, 0, 8)]
    # the whole 2x2 quadrant is contiguous before (2,0) — the locality point


def test_entity_salience_counts_share_and_rank(ray_session):
    """Crafted linked table: counts, page-share salience, and the
    (count desc, id asc) within-page rank — including a count tie."""
    import pyarrow as pa

    from lamapi_ray.pipelines.extras import entity_salience

    linked = pa.table(
        {
            "url": pa.array(
                ["p1", "p1", "p1", "p1", "p2", "p2"], pa.string()
            ),
            "id": pa.array(
                ["Q2", "Q1", "Q2", "Q3", "Q9", "Q9"], pa.string()
            ),
        }
    )
    out = entity_salience("unused", linked)
    rows = list(
        zip(
            out["url"].to_pylist(),
            out["id"].to_pylist(),
            out["n_mentions"].to_pylist(),
            out["salience"].to_pylist(),
            out["rank"].to_pylist(),
        )
    )
    assert rows == [
        ("p1", "Q2", 2, 0.5, 1),
        ("p1", "Q1", 1, 0.25, 2),   # tie with Q3 → id asc
        ("p1", "Q3", 1, 0.25, 3),
        ("p2", "Q9", 2, 1.0, 1),
    ]


def test_scd2_user_state_intervals(ray_session, tmp_path):
    """Crafted stream: run collapse, valid_to chaining, open current run,
    and the equal-ts event_id tie-break."""
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import scd2_user_state

    us = 1_000_000
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "ts": pa.array(
                [10 * us, 20 * us, 20 * us, 30 * us, 40 * us, 5 * us, 9 * us],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(
                ["view", "view", "click", "click", "view", "buy", "buy"],
                pa.string(),
            ),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    out = scd2_user_state(str(tmp_path))
    rows = list(
        zip(
            out["user_id"].to_pylist(),
            out["run_id"].to_pylist(),
            out["event_type"].to_pylist(),
            [t.timestamp() for t in out["valid_from"].to_pylist()],
            [None if t is None else t.timestamp()
             for t in out["valid_to"].to_pylist()],
            out["n_events"].to_pylist(),
            out["is_current"].to_pylist(),
        )
    )
    assert rows == [
        (1, 1, "view", 10.0, 20.0, 2, False),   # eid tie puts view@20 first
        (1, 2, "click", 20.0, 40.0, 2, False),
        (1, 3, "view", 40.0, None, 1, True),
        (2, 1, "buy", 5.0, None, 2, True),
    ]


def test_peak_concurrency_sweep(ray_session, tmp_path):
    """Crafted stream: overlap peaks, the close-before-open rule at an
    exact 900 s boundary (no phantom overlap), and day bucketing."""
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import peak_concurrency

    us = 1_000_000
    day = 86_400 * us
    ts = [
        0,            # A: [0, 900s)
        300 * us,     # B overlaps A            -> peak 2
        600 * us,     # C overlaps A,B          -> peak 3
        900 * us,     # D starts exactly at A's close -> stays 3
        day + 100 * us,  # next day, single     -> peak 1
    ]
    ev = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "event_type": pa.array(["view"] * len(ts), pa.string()),
            "value": pa.array([1.0] * len(ts), pa.float64()),
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    out = peak_concurrency(str(tmp_path))
    assert out["day"].to_pylist() == [0, 1]
    assert out["peak"].to_pylist() == [3, 1]


def test_cdc_upsert_merge_semantics(ray_session, tmp_path):
    """Crafted base: update wins over base, tombstone removes, insert
    appears, untouched rows pass through."""
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import cdc_upsert_merge

    base = pa.table(
        {
            "o_orderkey": pa.array([7, 10, 11, 107], pa.int64()),
            "o_totalprice": pa.array([70.0, 100.0, 110.0, 1070.0], pa.float64()),
            "o_orderstatus": pa.array(["O", "O", "O", "O"], pa.string()),
        }
    )
    pq.write_table(base, str(tmp_path / "orders.parquet"))
    out = cdc_upsert_merge(str(tmp_path))
    rows = list(
        zip(
            out["o_orderkey"].to_pylist(),
            out["o_totalprice"].to_pylist(),
            out["o_orderstatus"].to_pylist(),
        )
    )
    # key 7: tombstone (7 % 100 == 7) -> gone; key 107: also % 100 == 7 -> gone
    # key 10: updated (+10.0, 'U'); key 11: untouched
    # inserts: base keys < 500 -> 4 new keys above max (107), price halved
    assert rows == [
        (10, 110.0, "U"),
        (11, 110.0, "O"),
        (115, 35.0, "I"),     # 7 + 107 + 1
        (118, 50.0, "I"),     # 10 + 108
        (119, 55.0, "I"),     # 11 + 108
        (215, 535.0, "I"),    # 107 + 108
    ]


def test_itemset_pairs_crafted_baskets(tmp_path):
    """Known baskets → exact supports, lift, and min-support pruning.
    Baskets: u1={a,b,c}, u2={a,b}, u3={a,c}, u4={d} (d never pairs,
    (b,c) has support 1 → pruned at min_support=2)."""
    from lamapi_ray.pipelines import extras

    baskets = {1: ["a", "b", "c", "a"], 2: ["b", "a"], 3: ["a", "c"], 4: ["d"]}
    rows = []
    i = 0
    for u, ts in baskets.items():
        for t in ts:
            rows.append(
                {"event_id": i, "user_id": u, "event_type": t,
                 "ts": 1_000_000 * i, "value": 1.0}
            )
            i += 1
    _write_events(tmp_path, rows)
    out = extras.itemset_pairs(str(tmp_path)).to_pylist()
    got = {(r["item_a"], r["item_b"]): (r["support"], r["lift"]) for r in out}
    # sup: a=3, b=2, c=2, d=1; n_users=4
    assert set(got) == {("a", "b"), ("a", "c")}
    assert got[("a", "b")][0] == 2 and got[("a", "c")][0] == 2
    # lift(a,b) = 2*4/(3*2) = 1.333333 ; lift(a,c) identical
    assert got[("a", "b")][1] == float("%.6f" % (8 / 6))
    assert got[("a", "c")][1] == float("%.6f" % (8 / 6))
    # no pruning at min_support=1: (b,c) support 1 appears
    all_pairs = extras.itemset_pairs(str(tmp_path), min_support=1).to_pylist()
    keys = {(r["item_a"], r["item_b"]) for r in all_pairs}
    assert ("b", "c") in keys and ("a", "d") not in keys


def test_key_skew_profile_crafted(tmp_path):
    """Exact Gini and heavy-key table on a hand-built distribution:
    counts {1:6, 2:2, 3:1, 4:1} → asc (1,1,2,6), Σ i·c = 1+2+6+24 = 33,
    G = 2·33/(4·10) − 5/4 = 0.4; top keys ordered count desc, id asc."""
    from lamapi_ray.pipelines import extras

    rows = []
    i = 0
    for u, k in [(1, 6), (2, 2), (3, 1), (4, 1)]:
        for _ in range(k):
            rows.append(
                {"event_id": i, "user_id": u, "event_type": "a",
                 "ts": 1_000_000 * i, "value": 1.0}
            )
            i += 1
    _write_events(tmp_path, rows)
    out = extras.key_skew_profile(str(tmp_path), top_k=3).to_pylist()
    assert [r["user_id"] for r in out] == [1, 2, 3]
    assert [r["n"] for r in out] == [6, 2, 1]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert all(r["n_keys"] == 4 and r["n_rows"] == 10 for r in out)
    assert all(abs(r["gini"] - 0.4) < 1e-9 for r in out)
    assert out[0]["share"] == 0.6
    # uniform distribution → Gini 0
    rows = [
        {"event_id": j, "user_id": j % 5, "event_type": "a",
         "ts": 1_000_000 * j, "value": 1.0}
        for j in range(10)
    ]
    _write_events(tmp_path, rows)
    out2 = extras.key_skew_profile(str(tmp_path)).to_pylist()
    assert all(r["gini"] == 0.0 for r in out2)


def test_equidepth_histogram_ntile_semantics(tmp_path):
    """NTILE sizes and tie-straddling boundaries on a crafted stream:
    10 rows, 4 buckets → sizes (3,3,2,2); values (in cents) sorted are
    [100×4, 200×3, 300×2, 400×1], so the 100-tie block straddles the
    bucket-1/2 boundary — bucket 1 = (100,100), bucket 2 = (100,200)."""
    from lamapi_ray.pipelines import extras

    cents = [100, 100, 100, 100, 200, 200, 200, 300, 300, 400]
    rows = [
        {"event_id": i, "user_id": 1, "event_type": "a",
         "ts": 1_000_000 * i, "value": c / 100.0}
        for i, c in enumerate(reversed(cents))
    ]
    _write_events(tmp_path, rows)
    out = extras.equidepth_histogram(str(tmp_path), n_buckets=4).to_pylist()
    assert [r["bucket"] for r in out] == [1, 2, 3, 4]
    assert [r["n"] for r in out] == [3, 3, 2, 2]
    assert [(r["lo_cents"], r["hi_cents"]) for r in out] == [
        (100, 100), (100, 200), (200, 300), (300, 400)
    ]
    # more buckets than rows: b clamps to N, one row per bucket
    rows = [
        {"event_id": i, "user_id": 1, "event_type": "a",
         "ts": 1_000_000 * i, "value": float(i + 1)}
        for i in range(3)
    ]
    _write_events(tmp_path, rows)
    out2 = extras.equidepth_histogram(str(tmp_path), n_buckets=16).to_pylist()
    assert [r["n"] for r in out2] == [1, 1, 1]
    assert [r["lo_cents"] for r in out2] == [100, 200, 300]


def test_value_trend_ols_exact_line(tmp_path):
    """Points on an exact line recover slope/intercept exactly; a group
    with zero day-variance yields NULL slope/intercept."""
    from lamapi_ray.pipelines import extras

    DAY_US = 86_400_000_000
    base = 19723 * DAY_US  # 2024-01-01
    rows = []
    # type a: cents = 100 + 100·day for days 0..2 → slope 100, icpt 100
    for d in range(3):
        rows.append(
            {"event_id": d, "user_id": 1, "event_type": "a",
             "ts": base + d * DAY_US, "value": (100 + 100 * d) / 100.0}
        )
    # type b: all rows on one day → degenerate
    for j in range(2):
        rows.append(
            {"event_id": 10 + j, "user_id": 1, "event_type": "b",
             "ts": base + j, "value": 5.0}
        )
    _write_events(tmp_path, rows)
    out = {r["event_type"]: r for r in
           extras.value_trend_ols(str(tmp_path)).to_pylist()}
    assert out["a"]["n"] == 3
    assert out["a"]["slope"] == 100.0 and out["a"]["intercept"] == 100.0
    assert out["b"]["n"] == 2
    assert out["b"]["slope"] is None and out["b"]["intercept"] is None


def test_skyline_parts_strict_domination(tmp_path):
    """Crafted frontier: duplicates both survive, equal-price smaller
    size is dominated, equal-size higher price is dominated; result
    matches a brute-force NOT EXISTS recompute."""
    from lamapi_ray.pipelines import extras

    rows = [
        (1, 10.00, 5), (2, 10.00, 5),   # duplicate frontier point — both stay
        (3, 10.00, 4),                  # same price, smaller size → dominated
        (4, 12.00, 5),                  # same size, higher price → dominated
        (5, 8.00, 3),                   # cheaper, smaller → frontier
        (6, 15.00, 9),                  # bigger, pricier → frontier
        (7, 16.00, 9),                  # dominated by 6
    ]
    tbl = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_retailprice": pa.array([r[1] for r in rows], pa.float64()),
            "p_size": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "part.parquet")
    out = extras.skyline_parts(str(tmp_path)).to_pylist()
    assert [r["p_partkey"] for r in out] == [1, 2, 5, 6]
    # brute-force NOT EXISTS recompute (strict clause excludes equal
    # points, so duplicates never dominate each other)
    pts = {k: (int(p * 100), s) for k, p, s in rows}

    def dominated(k):
        pc_, sz = pts[k]
        return any(
            o[0] <= pc_ and o[1] >= sz and (o[0] < pc_ or o[1] > sz)
            for o in pts.values()
        )

    brute = sorted(k for k in pts if not dominated(k))
    assert [r["p_partkey"] for r in out] == brute


def test_user_entropy_histogram_crafted(tmp_path):
    """Hand-built users: H=0 single-type user lands in bin 0; a uniform
    2-type user has H = ln 2 ≈ 0.693 → bin 6; a uniform 4-type user has
    H = ln 4 ≈ 1.386 → bin 13 (micro-nat floors cannot cross these bin
    edges: the fractional parts sit far from the 0.1 boundaries)."""
    from lamapi_ray.pipelines import extras

    rows = []
    i = 0
    # user 1: 4 events of one type → H = 0
    for _ in range(4):
        rows.append({"event_id": i, "user_id": 1, "event_type": "view",
                     "ts": 1_000_000 * i, "value": 1.0}); i += 1
    # user 2: 2+2 of two types → H = ln 2
    for t in ("view", "click", "view", "click"):
        rows.append({"event_id": i, "user_id": 2, "event_type": t,
                     "ts": 1_000_000 * i, "value": 1.0}); i += 1
    # user 3: one each of four types → H = ln 4
    for t in ("view", "click", "purchase", "signup"):
        rows.append({"event_id": i, "user_id": 3, "event_type": t,
                     "ts": 1_000_000 * i, "value": 1.0}); i += 1
    _write_events(tmp_path, rows)
    out = {r["bin"]: r for r in
           extras.user_entropy_histogram(str(tmp_path)).to_pylist()}
    assert set(out) == {0, 6, 13}
    assert out[0]["n_users"] == 1
    assert out[6]["n_users"] == 1 and out[6]["entropy_lo"] == 0.6
    assert out[13]["n_users"] == 1 and out[13]["entropy_lo"] == 1.3


def test_daily_autocorr_crafted_series(tmp_path):
    """A strictly increasing daily series has r1 = 1 exactly (both
    (x,y) vectors affine images of each other); a constant series is
    zero-variance → NULL; zero-filled gap days enter the pairs."""
    from lamapi_ray.pipelines import extras

    DAY_US = 86_400_000_000
    base = 19723 * DAY_US  # 2024-01-01
    rows = []
    i = 0
    # type "a": counts 1,2,3,4 on days 0-3 → perfectly linear, r1 = 1
    for d in range(4):
        for _ in range(d + 1):
            rows.append({"event_id": i, "user_id": 1, "event_type": "a",
                         "ts": base + d * DAY_US + i, "value": 1.0}); i += 1
    # type "b": one event on day 0 and day 3 → zero-filled days 1, 2
    # series (1,0,0,1): pairs (1,0),(0,0),(0,1) → r1 = -1/2
    for d in (0, 3):
        rows.append({"event_id": i, "user_id": 2, "event_type": "b",
                     "ts": base + d * DAY_US + i, "value": 1.0}); i += 1
    # type "c": constant 1 per day on all 4 days → NULL
    for d in range(4):
        rows.append({"event_id": i, "user_id": 3, "event_type": "c",
                     "ts": base + d * DAY_US + i, "value": 1.0}); i += 1
    _write_events(tmp_path, rows)
    out = {r["event_type"]: r for r in
           extras.daily_autocorr(str(tmp_path)).to_pylist()}
    assert out["a"]["n_pairs"] == 3 and out["a"]["autocorr1"] == 1.0
    assert out["b"]["autocorr1"] == -0.5
    assert out["c"]["autocorr1"] is None


def test_ewma_daily_dyadic_chain(tmp_path):
    """Crafted series (counts 4, 0, 8 on days 0-2): e = 4, 2, 5 exactly
    (α = 1/2 dyadic chain); zero-filled day 1 participates."""
    from lamapi_ray.pipelines import extras

    DAY_US = 86_400_000_000
    base = 19723 * DAY_US
    rows = []
    i = 0
    for d, k in ((0, 4), (2, 8)):
        for _ in range(k):
            rows.append({"event_id": i, "user_id": 1, "event_type": "a",
                         "ts": base + d * DAY_US + i, "value": 1.0}); i += 1
    _write_events(tmp_path, rows)
    out = extras.ewma_daily(str(tmp_path)).to_pylist()
    assert [(r["day"], r["ewma"]) for r in out] == [(0, 4.0), (1, 2.0), (2, 5.0)]
