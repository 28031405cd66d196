"""Graph analytics operators (stages/graph.py) vs naive in-memory refs."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.graph import (
    PR_DEN,
    PR_NUM,
    PR_SCALE,
    ancestor_closure,
    degrees,
    pagerank,
)


def _tbl(edges):
    return pa.table(
        {
            "subj": pa.array([a for a, _ in edges], pa.string()),
            "obj": pa.array([b for _, b in edges], pa.string()),
        }
    )


EDGES = [
    ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
    ("D", "C"), ("B", "D"), ("E", "A"),  # E dangles in, F absent
]


def test_degrees_matches_counts():
    out = (
        pa.concat_tables(
            degrees(ray.data.from_arrow(_tbl(EDGES))).iter_batches(
                batch_format="pyarrow", batch_size=4096
            )
        )
        .sort_by("entity")
        .to_pydict()
    )
    exp_out = {"A": 2, "B": 2, "C": 1, "D": 1, "E": 1}
    exp_in = {"A": 2, "B": 1, "C": 3, "D": 1, "E": 0}
    assert out["entity"] == sorted(exp_out)
    assert out["out_deg"] == [exp_out[e] for e in sorted(exp_out)]
    assert out["in_deg"] == [exp_in[e] for e in sorted(exp_in)]


def _naive_pagerank(edges, iters):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    out_deg = np.zeros(len(nodes), np.int64)
    for a, _ in edges:
        out_deg[idx[a]] += 1
    n = len(nodes)
    rf = np.full(n, PR_SCALE // n, np.int64)
    base = ((PR_DEN - PR_NUM) * PR_SCALE) // (PR_DEN * n)
    for _ in range(iters):
        s = np.zeros(n, np.int64)
        for a, b in edges:
            s[idx[b]] += rf[idx[a]] // out_deg[idx[a]]
        rf = base + (PR_NUM * s) // PR_DEN
    return nodes, rf


def test_pagerank_matches_naive_fixed_point():
    res = (
        pa.concat_tables(
            pagerank(ray.data.from_arrow(_tbl(EDGES)), iters=3).iter_batches(
                batch_format="pyarrow", batch_size=4096
            )
        )
        .sort_by("entity")
        .to_pydict()
    )
    nodes, rf = _naive_pagerank(EDGES, 3)
    assert res["entity"] == nodes
    assert res["rank_fp"] == rf.tolist()
    assert res["rank"] == (rf / float(PR_SCALE)).tolist()


def test_pagerank_broadcast_equals_shuffle():
    tbl = _tbl(EDGES)
    res = {}
    for mode in ("broadcast", "shuffle"):
        res[mode] = (
            pa.concat_tables(
                pagerank(ray.data.from_arrow(tbl), iters=3, mode=mode).iter_batches(
                    batch_format="pyarrow", batch_size=4096
                )
            )
            .sort_by("entity")
            .to_pydict()
        )
    assert res["broadcast"] == res["shuffle"]


def test_pagerank_mass_conserved_within_truncation():
    # floor divisions only ever LOSE mass: total ≤ scale, and stays near it
    res = pa.concat_tables(
        pagerank(ray.data.from_arrow(_tbl(EDGES)), iters=3).iter_batches(
            batch_format="pyarrow", batch_size=4096
        )
    )
    total = sum(res["rank_fp"].to_pylist())
    assert total <= PR_SCALE
    assert total > PR_SCALE * 0.5  # damping + truncation, not collapse


def _parent_tbl(pairs):
    return pa.table(
        {
            "entity": pa.array([c for c, _ in pairs], pa.string()),
            "anc": pa.array([p for _, p in pairs], pa.string()),
        }
    )


def test_ancestor_closure_chain_and_forest():
    #   0 <- 1 <- 2 <- 3   (chain: depth 3) plus separate edge X <- Y
    pairs = [("1", "0"), ("2", "1"), ("3", "2"), ("Y", "X")]
    out = (
        pa.concat_tables(
            ancestor_closure(ray.data.from_arrow(_parent_tbl(pairs))).iter_batches(
                batch_format="pyarrow", batch_size=4096
            )
        )
        .sort_by([("entity", "ascending"), ("anc", "ascending")])
        .to_pylist()
    )
    expect = sorted(
        [
            {"entity": "1", "anc": "0"},
            {"entity": "2", "anc": "1"},
            {"entity": "2", "anc": "0"},
            {"entity": "3", "anc": "2"},
            {"entity": "3", "anc": "1"},
            {"entity": "3", "anc": "0"},
            {"entity": "Y", "anc": "X"},
        ],
        key=lambda r: (r["entity"], r["anc"]),
    )
    assert out == expect


def test_ancestor_closure_binary_heap_counts():
    # binary-heap forest over 0..14: |closure| = sum of node depths
    n = 15
    pairs = [(str(k), str((k - 1) // 2)) for k in range(1, n)]
    out = pa.concat_tables(
        ancestor_closure(ray.data.from_arrow(_parent_tbl(pairs))).iter_batches(
            batch_format="pyarrow", batch_size=4096
        )
    )
    depth = lambda k: 0 if k == 0 else 1 + depth((k - 1) // 2)  # noqa: E731
    assert len(out) == sum(depth(k) for k in range(1, n))


def test_triangle_count_matches_bruteforce(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.graph import triangle_count

    rng = np.random.default_rng(11)
    # random graph + a planted clique (skewed degrees), plus noise rows:
    # duplicates, self-loops, and both edge directions
    edges = set()
    for _ in range(260):
        a, b = rng.integers(0, 40, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    for a, b in itertools.combinations(range(6), 2):  # K6 on nodes 0-5
        edges.add((a, b))
    want = 0
    es = set(edges)
    nodes = sorted({n for e in edges for n in e})
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            want += 1
    ea = [a for a, b in edges] + [b for a, b in edges] + [7]
    eb = [b for a, b in edges] + [a for a, b in edges] + [7]  # self-loop noise
    tbl = pa.table(
        {"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())}
    )
    got = triangle_count(ray.data.from_arrow(tbl).repartition(4), num_buckets=8)
    assert got == want


def test_hits_matches_naive_integer_iterations(ray_session):
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.graph import hits

    # directed multigraph with a duplicate edge and a self-loop
    ea = [0, 0, 1, 2, 2, 3, 3, 3, 4]
    eb = [1, 2, 2, 0, 2, 1, 1, 5, 4]  # (3,1) twice, (4,4) self-loop
    tbl = pa.table({"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())})
    got = hits(ray.data.from_arrow(tbl).repartition(3), iters=2, num_buckets=4)

    nodes = sorted(set(ea) | set(eb))
    h = {v: 1 for v in nodes}
    for _ in range(2):
        a = {v: 0 for v in nodes}
        for s, d in zip(ea, eb):
            a[d] += h[s]
        h = {v: 0 for v in nodes}
        for s, d in zip(ea, eb):
            h[s] += a[d]
    assert got["node"].to_pylist() == nodes
    assert got["authority"].to_pylist() == [a[v] for v in nodes]
    assert got["hub"].to_pylist() == [h[v] for v in nodes]


def test_hits_overflow_guard_raises(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from lamapi_ray.stages.graph import hits

    # star: 2000 sources → 1 hub target; by iteration k scores grow like
    # fanin^(2k), so iters=8 trips the 2^62 // max_fanin guard
    n = 2000
    tbl = pa.table(
        {
            "a": pa.array(np.arange(n, dtype=np.int64)),
            "b": pa.array(np.zeros(n, dtype=np.int64)),
        }
    )
    with pytest.raises(ValueError, match="overflow"):
        hits(ray.data.from_arrow(tbl), iters=8, num_buckets=4)


def test_event_funnel_strict_order_semantics(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import event_funnel

    us = 1_000_000

    def ev(uid, et, t):
        return (uid, et, t * us)

    rows = [
        # user 1: full funnel in order
        ev(1, "view", 10), ev(1, "click", 20), ev(1, "purchase", 30),
        # user 2: click BEFORE first view → stops at view
        ev(2, "click", 5), ev(2, "view", 10), ev(2, "purchase", 20),
        # user 3: click at the SAME ts as view (strict > ⇒ non-progressing)
        ev(3, "view", 10), ev(3, "click", 10),
        # user 4: no view at all → reaches nothing
        ev(4, "click", 1), ev(4, "purchase", 2),
        # user 5: purchase between first view and first qualifying click
        ev(5, "view", 10), ev(5, "purchase", 15), ev(5, "click", 20),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = event_funnel(str(tmp_path))
    assert out["step"].to_pylist() == [1, 2, 3]
    assert out["event_type"].to_pylist() == ["view", "click", "purchase"]
    # views: users 1,2,3,5; clicks strictly after view: 1,5; purchases: 1
    assert out["n_users"].to_pylist() == [4, 2, 1]


def test_funnel_times_only_completers(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import funnel_times

    us = 1_000_000
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "view", 10), (2, "click", 20),          # never purchases
        (3, "purchase", 1), (3, "view", 2),         # purchase before view
        (4, "view", 0), (4, "click", 100), (4, "view", 50),
        (4, "purchase", 101),                        # t1 = FIRST view
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] * us for r in rows], pa.timestamp("us")),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = funnel_times(str(tmp_path))
    assert out["user_id"].to_pylist() == [1, 4]
    assert out["us_to_convert"].to_pylist() == [20 * us, 101 * us]


def test_personalized_pagerank_matches_naive(ray_session):
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.graph import PR_SCALE, personalized_pagerank

    # Q-id graph; seeds (qid % 17 == 0): Q17, Q34
    edges = [
        ("Q17", "Q1"), ("Q17", "Q2"), ("Q1", "Q34"), ("Q2", "Q34"),
        ("Q34", "Q17"), ("Q3", "Q17"), ("Q34", "Q3"),
    ]
    tbl = pa.table(
        {
            "subj": pa.array([a for a, _ in edges], pa.string()),
            "obj": pa.array([b for _, b in edges], pa.string()),
        }
    )
    got = (
        pa.concat_tables(
            personalized_pagerank(
                ray.data.from_arrow(tbl), iters=3
            ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        )
        .sort_by("entity")
    )
    nodes = sorted({n for e in edges for n in e})
    seeds = [n for n in nodes if int(n[1:]) % 17 == 0]
    out_deg = {n: sum(1 for a, _ in edges if a == n) for n in nodes}
    scnt = len(seeds)
    base = {n: ((100 - 85) * PR_SCALE) // (100 * scnt) if n in seeds else 0
            for n in nodes}
    rf = {n: PR_SCALE // scnt if n in seeds else 0 for n in nodes}
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for a, b in edges:
            contrib[b] += rf[a] // out_deg[a]
        rf = {n: base[n] + (85 * contrib[n]) // 100 for n in nodes}
    assert got["entity"].to_pylist() == nodes
    assert got["rank_fp"].to_pylist() == [rf[n] for n in nodes]
    # seeds hold teleport mass; a node only reachable FROM seeds ranks > 0
    assert rf["Q17"] > 0 and rf["Q1"] > 0
