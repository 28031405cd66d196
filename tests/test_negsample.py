"""KG negative sampling (pipelines/extras.py::kg_negative_samples)."""

import pyarrow as pa

from lamapi_ray.pipelines import extras

SF = "/root/testdata/sf0.001"


def _adjacency():
    import duckdb

    con = duckdb.connect()
    for t in ["part", "supplier", "customer", "nation", "region", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con.execute(
        """
        SELECT 'Q' || (200000 + s_suppkey) AS subj, 'P2' AS pred,
               'Q' || (400000 + s_nationkey) AS obj FROM supplier
        UNION
        SELECT 'Q' || (400000 + n_nationkey), 'P4',
               'Q' || (500000 + n_regionkey) FROM nation
        """
    ).arrow()


def test_neighbor_sample_top3_and_frontier_reuse(ray_session):
    # star: Q200000 -> 5 nations; chain into region samples
    rows = []
    for nk in range(5):
        rows.append((f"Q200000", "P2", f"Q40000{nk}"))
        rows.append((f"Q40000{nk}", "P4", f"Q50000{nk % 2}"))
    adj = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = extras.kg_neighbor_sample(SF, adj)
    trip = list(
        zip(out["seed"].to_pylist(), out["hop1"].to_pylist(), out["hop2"].to_pylist())
    )
    # brute-force the same hash ranking
    def top3(neigh):
        return sorted(neigh, key=lambda o: ((int(o[1:]) * 2654435761) % 1_000_000_007, int(o[1:])))[:3]

    k1 = {}
    for s in {r[0] for r in rows}:
        k1[s] = top3({o for ss, _, o in rows if ss == s})
    want = sorted(
        (s, h1, h2)
        for s, hs in k1.items()
        for h1 in hs
        for h2 in k1.get(h1, [])
    )
    assert sorted(trip) == want
    # every seed fans out to at most 3 distinct hop1s
    from collections import defaultdict

    fan = defaultdict(set)
    for s, h1, _ in trip:
        fan[s].add(h1)
    assert all(len(v) <= 3 for v in fan.values())


def test_negatives_are_in_class_and_never_real(ray_session):
    adj = pa.Table.from_batches(_adjacency().to_batches())
    out = extras.kg_negative_samples(SF, adj)
    real = set(
        zip(
            adj["subj"].to_pylist(),
            adj["pred"].to_pylist(),
            adj["obj"].to_pylist(),
        )
    )
    neg = list(
        zip(
            out["subj"].to_pylist(),
            out["pred"].to_pylist(),
            out["neg_obj"].to_pylist(),
            out["k"].to_pylist(),
        )
    )
    assert len(neg) > 0
    by_cls = {}
    for s, p, o, k in neg:
        # never a real edge
        assert (s, p, o) not in real
        # class preserved: P2 objects are nations (Q4xxxxx), P4 regions
        want = "Q4" if p == "P2" else "Q5"
        assert o.startswith(want), (s, p, o)
        by_cls.setdefault((s, p), set()).add(k)
    # at most 2 per source edge, ks within {0,1}
    assert all(ks <= {0, 1} for ks in by_cls.values())
    # accidental-positive filtering can drop samples, but not everything
    assert len(neg) >= len(real)


def test_predicate_functionality_crafted(ray_session):
    """Exact PARIS functionality on a hand-built edge list: P1 is
    strictly functional (3 subjects, 3 triples, 3 objects reused as 2),
    P2 is multi-valued (2 subjects over 4 triples)."""
    import pyarrow as pa

    from lamapi_ray.pipelines.extras import predicate_functionality

    adj = pa.table(
        {
            "subj": ["a", "b", "c", "x", "x", "y", "y"],
            "pred": ["P1", "P1", "P1", "P2", "P2", "P2", "P2"],
            "obj": ["o1", "o1", "o2", "u", "v", "u", "w"],
        }
    )
    out = predicate_functionality("unused", adj)
    rows = {r["pred"]: r for r in out.to_pylist()}
    assert rows["P1"]["n_triples"] == 3
    assert rows["P1"]["n_subjects"] == 3
    assert rows["P1"]["n_objects"] == 2
    assert rows["P1"]["functionality"] == 1.0
    assert abs(rows["P1"]["inverse_functionality"] - 0.666667) < 1e-9
    assert rows["P2"]["n_triples"] == 4
    assert rows["P2"]["n_subjects"] == 2
    assert rows["P2"]["n_objects"] == 3
    assert rows["P2"]["functionality"] == 0.5
    assert rows["P2"]["inverse_functionality"] == 0.75


def test_predicate_inverse_align_crafted(ray_session):
    """Exact inverse alignment on a hand-built edge list: P2 is the
    exact inverse of P1 (align(P1→P2) = 1.0, align(P2→P1) = 2/3 since
    P2 has one extra unreversed triple), P3 is symmetric on one pair
    (self-align 2/3 of its 3 distinct triples), duplicates collapse."""
    import pyarrow as pa

    from lamapi_ray.pipelines.extras import predicate_inverse_align

    adj = pa.table(
        {
            "subj": ["a", "b", "o1", "o2", "o3", "s", "t", "u", "s"],
            "pred": ["P1", "P1", "P2", "P2", "P2", "P3", "P3", "P3", "P3"],
            "obj":  ["o1", "o2", "a",  "b",  "c",  "t", "s", "v", "t"],
        }
    )
    out = predicate_inverse_align("unused", adj)
    rows = {(r["pred_p"], r["pred_q"]): r for r in out.to_pylist()}
    # P1 has 2 triples, both reversed in P2; P2 has 3, two reversed in P1
    assert rows[("P1", "P2")]["n_overlap"] == 2
    assert rows[("P1", "P2")]["n_p"] == 2
    assert rows[("P1", "P2")]["align"] == 1.0
    assert rows[("P2", "P1")]["n_overlap"] == 2
    assert rows[("P2", "P1")]["n_p"] == 3
    assert abs(rows[("P2", "P1")]["align"] - 0.666667) < 1e-9
    # P3: distinct triples (s,t),(t,s),(u,v) — the (s,t) dup collapses;
    # (s,t) and (t,s) reverse each other → self-overlap 2 of 3
    assert rows[("P3", "P3")]["n_overlap"] == 2
    assert rows[("P3", "P3")]["n_p"] == 3
    assert abs(rows[("P3", "P3")]["align"] - 0.666667) < 1e-9
    # no cross pairs between P3 and P1/P2
    assert set(rows) == {("P1", "P2"), ("P2", "P1"), ("P3", "P3")}


def test_bucketed_hash_join_dedup_sides(ray_session):
    """dedup_sides makes each side row-distinct inside its join bucket:
    duplicated input rows produce exactly the distinct-side join result."""
    import ray as _ray

    from lamapi_ray.stages.join import bucketed_hash_join

    left = pa.table(
        {"k": ["a", "a", "a", "b"], "lv": [1, 1, 2, 3]}  # (a,1) duplicated
    )
    right = pa.table(
        {"k": ["a", "b", "b"], "rv": [10, 20, 20]}  # (b,20) duplicated
    )
    out = bucketed_hash_join(
        _ray.data.from_arrow(left), _ray.data.from_arrow(right),
        on="k", num_buckets=4, dedup_sides=True,
    ).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    assert got == [("a", 1, 10), ("a", 2, 10), ("b", 3, 20)]
    # without dedup: multiplicities multiply (2·1 for (a,1,10), 1·2 for b)
    out2 = bucketed_hash_join(
        _ray.data.from_arrow(left), _ray.data.from_arrow(right),
        on="k", num_buckets=4,
    ).take_all()
    assert len(out2) == 2 * 1 + 1 * 1 + 1 * 2
