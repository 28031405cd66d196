"""Full-text BM25 search (stages/search.py) vs a naive in-memory reference."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.search import bm25_search


DOCS = [
    (0, "red fox jumps over the lazy dog"),
    (1, "red red wine"),
    (2, "the quick brown fox"),
    (3, "lazy summer day with a lazy dog"),
    (4, "wine and cheese pairings"),
    (5, "dog eats dog world of the red dog"),
]


def _naive(queries, k=3):
    texts = {d: t.split(" ") for d, t in DOCS}
    n = len(texts)
    sum_dl = sum(len(v) for v in texts.values())
    avgdl = np.float64(sum_dl) / n
    out = {}
    for q in queries:
        scores = {}
        for d, toks in texts.items():
            s = 0
            dl = len(toks)
            for t in sorted(set(q.split(" "))):
                tf = toks.count(t)
                if tf == 0:
                    continue
                df = sum(1 for v in texts.values() if t in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                c = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6
                s += int(math.floor(c))
            if s != 0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[q] = ranked
    return out


def test_bm25_search_matches_naive(ray_session):
    queries = ["red dog", "lazy fox", "wine", "missing term"]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )
    got = bm25_search(
        ray.data.from_arrow(tbl).repartition(3), queries, k=3
    )
    want = _naive(queries, k=3)
    rows = list(
        zip(
            got["query"].to_pylist(),
            got["doc_id"].to_pylist(),
            got["rank"].to_pylist(),
            got["bm25_micro"].to_pylist(),
        )
    )
    for q in queries:
        sub = [(d, r, s) for qq, d, r, s in rows if qq == q]
        assert [(d, s) for d, _, s in sub] == want[q], q
        assert [r for _, r, _ in sub] == list(range(1, len(sub) + 1))
    assert not [r for r in rows if r[0] == "missing term"]


def test_bm25_search_map_side_topk_keeps_global_order(ray_session):
    # 40 docs, tf gradient ensures distinct scores; k=5 across 8 blocks —
    # the map-side local top-k must not drop a global winner
    docs = [(i, ("zig " * (i % 7 + 1) + "zag").strip()) for i in range(40)]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    got = bm25_search(ray.data.from_arrow(tbl).repartition(8), ["zig"], k=5)
    texts = {d: t.split(" ") for d, t in docs}
    n = len(texts)
    avgdl = np.float64(sum(len(v) for v in texts.values())) / n
    df = sum(1 for v in texts.values() if "zig" in v)
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    want = sorted(
        (
            (
                d,
                int(
                    math.floor(
                        idf * toks.count("zig") * 2.2
                        / (toks.count("zig") + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
                        * 1e6
                    )
                ),
            )
            for d, toks in texts.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert list(zip(got["doc_id"].to_pylist(), got["bm25_micro"].to_pylist())) == want


def test_retrieval_metrics_crafted(ray_session, tmp_path):
    """Metrics sanity on the real corpus: ndcg in (0, 1], mrr consistent
    with first_hit_rank, idcg >= dcg, and a perfect-ranking doc set
    yields ndcg == 1 when the top-10 rel IS the ideal set."""
    from lamapi_ray.pipelines.extras import retrieval_metrics

    out = retrieval_metrics("/root/testdata/sf0.001")
    assert out.num_rows == 4
    for i in range(4):
        dcg = out["dcg10_micro"][i].as_py()
        idcg = out["idcg10_micro"][i].as_py()
        nd = out["ndcg10"][i].as_py()
        fh = out["first_hit_rank"][i].as_py()
        mrr = out["mrr10"][i].as_py()
        assert 0 <= dcg <= idcg
        assert 0.0 <= nd <= 1.0
        if fh > 0:
            assert abs(mrr - 1.0 / fh) < 1e-6
        else:
            assert mrr == 0.0
