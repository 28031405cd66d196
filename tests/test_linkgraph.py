"""Link-graph tests — vectorized href parsing, extract invariant, degrees."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.stages.extract import extract_text_batch
from lamapi_ray.stages.linkgraph import extract_links, link_indegree


def _pages(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "html": pa.array([r[1].encode() for r in rows], pa.binary()),
            }
        )
    )


def _collect(ds, keys):
    return pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([(k, "ascending") for k in keys])


def test_extract_links_parses_hrefs_in_order():
    rows = [
        ("doc://0", '<p>x <a href="doc://5">five</a> y <a href="doc://9">nine</a></p>'),
        ("doc://1", "<p>no links here</p>"),
        ("doc://2", '<a href="doc://5">again</a>'),
    ]
    out = _collect(extract_links(_pages(rows)), ["src", "rank"])
    assert out["src"].to_pylist() == ["doc://0", "doc://0", "doc://2"]
    assert out["dst"].to_pylist() == ["doc://5", "doc://9", "doc://5"]
    assert out["rank"].to_pylist() == [0, 1, 0]


def test_indegree():
    rows = [
        ("doc://0", '<a href="a">.</a><a href="b">.</a>'),
        ("doc://1", '<a href="a">.</a>'),
    ]
    out = _collect(link_indegree(extract_links(_pages(rows))), ["dst"])
    assert out["dst"].to_pylist() == ["a", "b"]
    assert out["indegree"].to_pylist() == [2, 1]


def test_anchor_tags_preserve_extracted_text():
    # the synth invariant: stripping the anchor markup leaves the text the
    # page would have carried without links
    batch = pa.table(
        {
            "url": pa.array(["doc://7"], pa.string()),
            "html": pa.array(
                [b'<html><body><p>body <a href="doc://3">part one</a> '
                 b'<a href="doc://9">part two</a> 42</p></body></html>'],
                pa.binary(),
            ),
            "text": pa.array([None], pa.large_string()),
        }
    )
    out = extract_text_batch(batch)
    assert out["text"][0].as_py() == "body part one part two 42"


def test_synth_pages_link_targets():
    import pyarrow.parquet as pq

    from lamapi_ray import synth

    sf = "/root/testdata/sf0.001"
    np_ = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    pages = synth.pages_dataset(sf)
    edges = _collect(extract_links(pages.limit(40)), ["src", "rank"])
    for src, dst, rank in zip(
        edges["src"].to_pylist(), edges["dst"].to_pylist(), edges["rank"].to_pylist()
    ):
        d = int(src.split("//")[1])
        expect = d % np_ if rank == 0 else (d * 7 + 13) % np_
        assert dst == f"doc://{expect}"


def test_entity_cooccurrence_pairs_survive_block_splits(ray_session):
    """One url's linked rows spread over MANY input blocks must still pair
    up — the coarse url-hash partition has to be deterministic across
    worker processes (a per-process `hash()` would silently drop pairs)."""
    import numpy as np
    import pyarrow as pa

    from lamapi_ray.pipelines.extras import entity_cooccurrence

    urls, ids = [], []
    # 40 pages x 3 entities, rows deliberately interleaved so consecutive
    # blocks never hold one url's rows together; plus duplicate links
    for e in ["Q3", "Q1", "Q2", "Q1"]:  # Q1 linked twice -> still one edge
        for p in range(40):
            urls.append(f"doc://{p}")
            ids.append(e if p % 2 == 0 else e.replace("Q", "Q1"))
    linked = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "mention": pa.array(["m"] * len(urls), pa.string()),
            "id": pa.array(ids, pa.string()),
        }
    )
    out = entity_cooccurrence("", linked)
    # even pages link {Q1,Q2,Q3}, odd pages link {Q11,Q12,Q13}
    want = {
        ("Q1", "Q2"): 20, ("Q1", "Q3"): 20, ("Q2", "Q3"): 20,
        ("Q11", "Q12"): 20, ("Q11", "Q13"): 20, ("Q12", "Q13"): 20,
    }
    got = {
        (r["e1"], r["e2"]): r["n_pages"] for r in out.to_pylist()
    }
    assert got == want
    # e1 < e2 canonical order everywhere
    assert all(a < b for a, b in got)


def test_co_citation_matches_naive(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import biblio_coupling, co_citation

    sf = "/root/testdata/sf0.001"
    np_rows = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    nd = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    edges = set()
    for d in range(nd):
        edges.add((d, d % np_rows))
        edges.add((d, (7 * d + 13) % np_rows))

    def naive(group_idx, pair_idx):
        from collections import defaultdict

        fan = defaultdict(set)
        for e in edges:
            fan[e[group_idx]].add(e[pair_idx])
        counts = defaultdict(int)
        for vals in fan.values():
            vs = sorted(vals)
            for i in range(len(vs)):
                for j in range(i + 1, len(vs)):
                    counts[(vs[i], vs[j])] += 1
        return counts

    for fn, gi, pi in ((co_citation, 0, 1), (biblio_coupling, 1, 0)):
        want = naive(gi, pi)
        got = fn(sf)
        pairs = list(
            zip(got["a"].to_pylist(), got["b"].to_pylist(), got["n_common"].to_pylist())
        )
        assert {(a, b): n for a, b, n in pairs} == dict(want)
        ab = [(a, b) for a, b, _ in pairs]
        assert ab == sorted(ab)


def test_link_pair_counts_max_fan_guard(ray_session):
    import pytest

    from lamapi_ray.pipelines.extras import _link_pair_counts

    # the synth graph's max in-degree at sf0.001 exceeds a fan cap of 1,
    # so the guard must trip instead of silently expanding Θ(fan²) pairs
    with pytest.raises(ValueError, match="max_fan"):
        _link_pair_counts(
            "/root/testdata/sf0.001", group_end="dst", pair_end="src", max_fan=1
        )


def test_link_components_matches_union_find(ray_session):
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_components

    sf = "/root/testdata/sf0.001"
    np_rows = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    nd = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    edges = []
    for d in range(nd):
        edges.append((d, d % np_rows))
        edges.append((d, (7 * d + 13) % np_rows))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for v in parent:
        want[v] = find(v)
    # min-label: component id = min node of the component
    comp_min = {}
    for v, r in want.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[r] for v, r in want.items()}

    got = link_components(sf)
    got_d = dict(zip(got["node"].to_pylist(), got["component"].to_pylist()))
    assert got_d == want


def test_link_bfs_hops_matches_naive(ray_session):
    import collections

    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_bfs_hops

    sf = "/root/testdata/sf0.001"
    np_rows = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    nd = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    adj = collections.defaultdict(set)
    nodes = set()
    for d in range(nd):
        for t in (d % np_rows, (7 * d + 13) % np_rows):
            adj[d].add(t)
            nodes.add(d)
            nodes.add(t)
    dist = {v: 0 for v in nodes if v % 31 == 0}
    frontier = set(dist)
    for hop in (1, 2, 3):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = hop
        frontier = nxt

    got = link_bfs_hops(sf)
    got_d = dict(zip(got["node"].to_pylist(), got["dist"].to_pylist()))
    assert got_d == dist
    assert got["node"].to_pylist() == sorted(got_d)


def test_link_lpa_matches_naive(ray_session):
    import collections

    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_lpa_communities

    sf = "/root/testdata/sf0.001"
    np_rows = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    nd = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    nbrs = collections.defaultdict(set)
    for d in range(nd):
        for t in (d % np_rows, (7 * d + 13) % np_rows):
            if d != t:
                nbrs[d].add(t)
                nbrs[t].add(d)
    lab = {v: v for v in nbrs}
    for _ in range(2):
        new = {}
        for v, ns in nbrs.items():
            cnt = collections.Counter(lab[u] for u in ns)
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        lab = new

    got = link_lpa_communities(sf)
    got_d = dict(zip(got["node"].to_pylist(), got["community"].to_pylist()))
    assert got_d == lab


def test_link_kcore_matches_peeling(ray_session):
    """h-index fixed point must equal true core numbers from the
    textbook Matula-Beck min-degree peel — an INDEPENDENT algorithm."""
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_kcore

    sf = "/root/testdata/sf0.001"
    np_rows = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    nd = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    adj = {}

    def add(a, b):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)

    for d in range(nd):
        add(d, d % np_rows)
        add(d, (7 * d + 13) % np_rows)
        if d % 50 == 0 and d + 5 < nd:
            for i in range(6):
                for j in range(i + 1, 6):
                    add(d + i, d + j)

    deg = {v: len(ns) for v, ns in adj.items()}
    want, k = {}, 0
    live = set(adj)
    while live:
        k = max(k, min(deg[v] for v in live))
        peel = [v for v in live if deg[v] <= k]
        while peel:
            v = peel.pop()
            if v not in live:
                continue
            want[v] = k
            live.discard(v)
            for u in adj[v]:
                if u in live:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)

    got = link_kcore(sf)
    got_d = dict(zip(got["node"].to_pylist(), got["core"].to_pylist()))
    assert got_d == want


def test_link_random_walks_matches_naive(ray_session):
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_random_walks

    sf = "/root/testdata/sf0.001"
    np_rows = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    nd = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    M = 1_000_000_007
    adj = {}
    for d in range(nd):
        for t in (d % np_rows, (7 * d + 13) % np_rows):
            if t != d:
                adj.setdefault(d, set()).add(t)
    adj = {s: sorted(ts) for s, ts in adj.items()}
    nodes = sorted(set(adj) | {t for ts in adj.values() for t in ts})

    want = []
    for seed in (v for v in nodes if v % 17 == 0):
        v = seed
        want.append((seed, 0, v))
        for st in range(1, 4):
            ns = adj.get(v)
            if not ns:
                break
            h = ((seed % M) * 1315423911 % M + st * 2654435761 % M
                 + (v % M) * 97 % M) % M
            v = ns[h % len(ns)]
            want.append((seed, st, v))

    got = link_random_walks(sf)
    got_rows = list(zip(got["walk"].to_pylist(), got["step"].to_pylist(),
                        got["node"].to_pylist()))
    assert sorted(got_rows) == sorted(want)


def test_walk_skipgrams_window_pairs(ray_session):
    from lamapi_ray.pipelines.extras import link_random_walks, walk_skipgrams

    sf = "/root/testdata/sf0.001"
    w = link_random_walks(sf)
    rows = list(zip(w["walk"].to_pylist(), w["step"].to_pylist(),
                    w["node"].to_pylist()))
    by_walk = {}
    for wk, st, nd in rows:
        by_walk.setdefault(wk, []).append((st, nd))
    want = {}
    for seq in by_walk.values():
        seq.sort()
        for i, (si, ni) in enumerate(seq):
            for j in range(i + 1, len(seq)):
                sj, nj = seq[j]
                if sj - si > 2:
                    break
                for a, b in ((ni, nj), (nj, ni)):
                    want[(a, b)] = want.get((a, b), 0) + 1
    got = walk_skipgrams(sf)
    got_d = {
        (c, x): n
        for c, x, n in zip(got["center"].to_pylist(), got["context"].to_pylist(),
                           got["n_pairs"].to_pylist())
    }
    assert got_d == want


def test_link_graph_stats_naive(ray_session):
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_graph_stats

    sf = "/root/testdata/sf0.001"
    np_rows = pq.ParquetFile(f"{sf}/part.parquet").metadata.num_rows
    nd = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    e = set()
    for d in range(nd):
        for t in (d % np_rows, (7 * d + 13) % np_rows):
            if t != d:
                e.add((d, t))
    out_deg, in_deg = {}, {}
    for s, d in e:
        out_deg[s] = out_deg.get(s, 0) + 1
        in_deg[d] = in_deg.get(d, 0) + 1
    nodes = set(out_deg) | set(in_deg)
    xs = [(out_deg[s], in_deg[d]) for s, d in e]
    got = {k: v[0] for k, v in got_map(link_graph_stats(sf)).items()}
    assert got["n_nodes"] == len(nodes)
    assert got["n_edges"] == len(e)
    assert got["n_reciprocal"] == sum((d, s) in e for s, d in e)
    assert got["sum_x"] == sum(x for x, _ in xs)
    assert got["sum_y"] == sum(y for _, y in xs)
    assert got["sum_xy"] == sum(x * y for x, y in xs)
    assert got["sum_x2"] == sum(x * x for x, _ in xs)
    assert got["sum_y2"] == sum(y * y for _, y in xs)


def got_map(tbl):
    return {c: tbl[c].to_pylist() for c in tbl.column_names}


def test_component_sizes_match_components(ray_session):
    from collections import Counter

    from lamapi_ray.pipelines.extras import component_sizes, link_components

    sf = "/root/testdata/sf0.001"
    comp = link_components(sf)
    sizes = Counter(Counter(comp["component"].to_pylist()).values())
    got = component_sizes(sf)
    got_d = dict(zip(got["size"].to_pylist(), got["n_components"].to_pylist()))
    assert got_d == dict(sizes)


def test_gnn_neighbor_agg_naive_equality(ray_session, tmp_path):
    """Two-layer in-neighbor aggregation must equal the naive per-node
    computation over the same edge multiset (multiplicity + self-loops)."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from lamapi_ray import synth
    from lamapi_ray.pipelines.extras import gnn_neighbor_agg
    from lamapi_ray.stages.linkgraph import extract_links

    sf = "/root/testdata/sf0.001"
    out = gnn_neighbor_agg(sf)

    edges_tbl = pa.concat_tables(
        extract_links(synth.pages_dataset(sf)).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"
        )
    )
    src = [int(s[6:]) for s in edges_tbl["src"].to_pylist()]
    dst = [int(s[6:]) for s in edges_tbl["dst"].to_pylist()]
    indeg = defaultdict(int)
    for d in dst:
        indeg[d] += 1
    h1 = defaultdict(int)
    for s, d in zip(src, dst):
        h1[d] += indeg.get(s, 0)
    h2 = defaultdict(int)
    for s, d in zip(src, dst):
        h2[d] += h1.get(s, 0)
    want = sorted(indeg)
    assert out["node"].to_pylist() == want
    assert out["n_in"].to_pylist() == [indeg[v] for v in want]
    assert out["h1_sum"].to_pylist() == [h1[v] for v in want]
    assert out["h2_sum"].to_pylist() == [h2[v] for v in want]
    for m, s, c in zip(
        out["h1_mean"].to_pylist(),
        out["h1_sum"].to_pylist(),
        out["n_in"].to_pylist(),
    ):
        assert abs(m - s / c) < 1e-6


def test_local_clustering_consistent_with_global_triangles(ray_session):
    """Σ per-node triangle counts == 3 × the global triangle count, and
    every planted-triad node's cc is consistent with its degree."""
    from lamapi_ray.pipelines.extras import link_triangles, local_clustering

    sf = "/root/testdata/sf0.001"
    out = local_clustering(sf)
    glob = link_triangles(sf)["n_triangles"][0].as_py()
    assert sum(out["n_triangles"].to_pylist()) == 3 * glob
    for i in range(out.num_rows):
        d = out["degree"][i].as_py()
        t = out["n_triangles"][i].as_py()
        cc = out["cc"][i].as_py()
        assert 0 <= t <= d * (d - 1) // 2
        assert abs(cc - 2 * t / (d * (d - 1))) < 1e-6


def test_degree_histogram_matches_direct_recompute(ray_session):
    """Histogram equals a direct numpy recomputation of the synthetic
    edge model (doc_id % P, (7*doc_id+13) % P, hub doc_id % 16)."""
    import numpy as np
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import degree_histogram

    sf = "/root/testdata/sf0.001"
    out = degree_histogram(sf)
    doc_id = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nparts = pq.read_metadata(f"{sf}/part.parquet").num_rows
    dst = np.concatenate(
        [doc_id % nparts, (doc_id * 7 + 13) % nparts, doc_id % 16]
    )
    _, deg = np.unique(dst, return_counts=True)
    bins, n_nodes = np.unique(
        np.floor(np.log2(deg.astype(np.float64))).astype(np.int64),
        return_counts=True,
    )
    assert out["bin"].to_pylist() == bins.tolist()
    assert out["n_nodes"].to_pylist() == n_nodes.tolist()
    assert out["lo_degree"].to_pylist() == (1 << bins).tolist()
    # the hub overlay guarantees a heavy-tail bin beyond degree 1-2
    assert max(out["bin"].to_pylist()) >= 2


def test_adamic_adar_matches_bruteforce(ray_session):
    """Engine AA scores equal a brute-force neighbor-set recompute over
    the same closed-form edge model (organic links + planted triads,
    distinct undirected), including the micro-nat weight quantization
    and the existing-edge anti-join."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import adamic_adar

    sf = "/root/testdata/sf0.001"
    out = adamic_adar(sf)

    doc_id = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nparts = pq.read_metadata(f"{sf}/part.parquet").num_rows
    ndocs = len(doc_id)
    edges = set()
    for d in doc_id:
        for t in (int(d) % nparts, (int(d) * 7 + 13) % nparts):
            if t != int(d):
                edges.add((min(int(d), t), max(int(d), t)))
        if d % 7 == 0 and d + 2 < ndocs:
            d = int(d)
            edges.update({(d, d + 1), (d + 1, d + 2), (d, d + 2)})
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    scores: dict[tuple[int, int], int] = {}
    common: dict[tuple[int, int], int] = {}
    for z, ns in nbrs.items():
        if len(ns) < 2:
            continue
        q = math.floor(1e6 / math.log(len(ns)))
        sn = sorted(ns)
        for i in range(len(sn)):
            for j in range(i + 1, len(sn)):
                k = (sn[i], sn[j])
                scores[k] = scores.get(k, 0) + q
                common[k] = common.get(k, 0) + 1
    expect = sorted(
        (a, b, common[(a, b)], scores[(a, b)])
        for (a, b) in scores
        if (a, b) not in edges
    )
    got = list(
        zip(
            out["a"].to_pylist(),
            out["b"].to_pylist(),
            out["n_common"].to_pylist(),
            out["score_micro"].to_pylist(),
        )
    )
    assert got == expect
    assert out.num_rows > 0
    for sm, s in zip(out["score_micro"].to_pylist(), out["score"].to_pylist()):
        assert s == float("%.6f" % (sm / 1e6))


def test_adamic_adar_apex_degree_cap(ray_session):
    """max_apex_degree prunes every wedge whose apex degree exceeds the
    cap — capped output is a subset with scores ≤ the exact run's."""
    from lamapi_ray.pipelines.extras import adamic_adar

    sf = "/root/testdata/sf0.001"
    exact = adamic_adar(sf)
    capped = adamic_adar(sf, max_apex_degree=3)
    ex = {
        (a, b): (n, s)
        for a, b, n, s in zip(
            exact["a"].to_pylist(), exact["b"].to_pylist(),
            exact["n_common"].to_pylist(), exact["score_micro"].to_pylist(),
        )
    }
    assert 0 < capped.num_rows < exact.num_rows
    for a, b, n, s in zip(
        capped["a"].to_pylist(), capped["b"].to_pylist(),
        capped["n_common"].to_pylist(), capped["score_micro"].to_pylist(),
    ):
        n0, s0 = ex[(a, b)]
        assert n <= n0 and s <= s0


def test_neighborhood_function_matches_bruteforce(ray_session):
    """ANF curve equals a brute-force BFS-set recompute over the same
    closed-form edge model (doc % P, (7·doc+13) % P, directed, with
    self pairs at t=0): reach_pairs is exactly Σ_v |N≤t(v)|."""
    import numpy as np
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import neighborhood_function

    sf = "/root/testdata/sf0.001"
    out = neighborhood_function(sf)
    doc_id = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nparts = pq.read_metadata(f"{sf}/part.parquet").num_rows
    src = np.concatenate([doc_id, doc_id])
    dst = np.concatenate([doc_id % nparts, (doc_id * 7 + 13) % nparts])
    adj: dict[int, set] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set()).add(d)
    nodes = set(src.tolist()) | set(dst.tolist())
    n0 = len(nodes)
    r1 = {v: {v} | adj.get(v, set()) for v in nodes}
    r2 = {
        v: r1[v] | set().union(*(adj.get(m, set()) for m in r1[v]))
        for v in nodes
    }
    expect = [n0, sum(len(s) for s in r1.values()),
              sum(len(s) for s in r2.values())]
    assert out["t"].to_pylist() == [0, 1, 2]
    assert out["n_nodes"].to_pylist() == [n0] * 3
    assert out["reach_pairs"].to_pylist() == expect
    # curve is monotone and avg_reach consistent
    av = out["avg_reach"].to_pylist()
    assert all(abs(av[i] - float("%.6f" % (expect[i] / n0))) < 1e-12
               for i in range(3))


def test_link_assortativity_matches_bruteforce(ray_session):
    """Pearson r over (total-deg(src), total-deg(dst)) equals an exact numpy
    recompute of the closed-form edge model, including the rounding."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_assortativity

    sf = "/root/testdata/sf0.001"
    out = link_assortativity(sf)
    doc_id = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nparts = pq.read_metadata(f"{sf}/part.parquet").num_rows
    src = np.concatenate([doc_id, doc_id])
    dst = np.concatenate([doc_id % nparts, (doc_id * 7 + 13) % nparts])
    u, c = np.unique(np.concatenate([src, dst]), return_counts=True)
    x = c[np.searchsorted(u, src)].astype(object)
    y = c[np.searchsorted(u, dst)].astype(object)
    n = len(src)
    sx, sy = int(sum(x)), int(sum(y))
    sxy, sxx, syy = int(sum(x * y)), int(sum(x * x)), int(sum(y * y))
    r = float(n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )
    assert out["n_edges"].to_pylist() == [n]
    assert out["assortativity"].to_pylist() == [float("%.6f" % r)]


def test_link_reciprocity_matches_bruteforce(ray_session):
    """Reciprocity equals an exact set recompute of the closed-form edge
    model, and a hand case verifies self-loops count as reciprocal."""
    import numpy as np
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import link_reciprocity

    sf = "/root/testdata/sf0.001"
    out = link_reciprocity(sf)
    doc_id = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nparts = pq.read_metadata(f"{sf}/part.parquet").num_rows
    e = set(zip(doc_id.tolist(), (doc_id % nparts).tolist()))
    e |= set(zip(doc_id.tolist(), ((doc_id * 7 + 13) % nparts).tolist()))
    m = len(e)
    r = sum(1 for s, d in e if (d, s) in e)
    assert out["n_edges"].to_pylist() == [m]
    assert out["n_reciprocal"].to_pylist() == [r]
    assert out["reciprocity"].to_pylist() == [float("%.6f" % (r / m))]
    # a self-loop (v,v) is its own reverse by construction of the set
    # recompute above — both sides agree on that convention
