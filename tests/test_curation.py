"""Corpus-curation operators: decontamination, repetition stats, mix
rebalancing (lamapi_ray/stages/curation.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.curation import (
    decontaminate,
    rebalance_sources,
    repetition_stats,
)


def _ds(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _tbl(ds):
    batches = list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    return pa.concat_tables(batches).sort_by("doc_id")


def test_decontaminate_flags_shared_4gram():
    bench = pa.Table.from_pylist(
        [{"doc_id": 100, "text": "alpha beta gamma delta epsilon"}]
    )
    corpus = _ds(
        [
            # shares the 4-grams "alpha beta gamma delta" AND
            # "beta gamma delta epsilon" (distinct hits = 2)
            {"doc_id": 1, "text": "xx alpha beta gamma delta epsilon yy"},
            # shares only a 3-gram — below k=4, clean
            {"doc_id": 2, "text": "alpha beta gamma zz ww vv uu"},
            # disjoint vocabulary
            {"doc_id": 3, "text": "one two three four five six seven"},
        ]
    )
    out = _tbl(decontaminate(corpus, bench, k=4))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["contaminated"] and rows[1]["n_hits"] == 2
    assert not rows[2]["contaminated"] and rows[2]["n_hits"] == 0
    assert not rows[3]["contaminated"]


def test_decontaminate_short_doc_whole_text_gram():
    # a benchmark doc shorter than k folds ALL its tokens into one gram;
    # a corpus doc that IS that text (same short length) matches it
    bench = pa.Table.from_pylist([{"doc_id": 9, "text": "aa bb"}])
    corpus = _ds(
        [{"doc_id": 1, "text": "aa bb"}, {"doc_id": 2, "text": "aa bb cc dd"}]
    )
    out = _tbl(decontaminate(corpus, bench, k=4))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["contaminated"]
    # doc 2 has >=k tokens so it yields only true 4-grams, none equal to
    # the benchmark's short fold
    assert not rows[2]["contaminated"]


def test_repetition_stats_flags_repetitive_doc():
    corpus = _ds(
        [
            {"doc_id": 1, "text": "spam spam spam spam spam spam"},
            {"doc_id": 2, "text": "the quick brown fox jumps over dogs"},
        ]
    )
    out = _tbl(repetition_stats(corpus, top2_threshold=0.5, dup3_threshold=0.5))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # all five 2-grams identical -> top2 frac 1.0; 3-grams all dupes
    assert rows[1]["top2gram_frac"] == 1.0
    assert rows[1]["dup3gram_frac"] == 0.75  # 4 total, 1 distinct
    assert rows[1]["flagged"]
    # all distinct
    assert rows[2]["top2gram_frac"] == 1.0 / 6.0 or rows[2]["top2gram_frac"] < 0.2
    assert rows[2]["dup3gram_frac"] == 0.0
    assert not rows[2]["flagged"]


def test_rebalance_sources_deterministic_and_weighted():
    rng = np.random.RandomState(7)
    rows = [
        {"doc_id": int(i), "source": f"src{i % 4}"} for i in range(4000)
    ]
    corpus = _ds(rows)
    weights = {"src0": 1, "src1": 2, "src2": 1, "src3": 2}
    out1 = _tbl(rebalance_sources(corpus, weights))
    out2 = _tbl(rebalance_sources(_ds(rows), weights))
    assert out1.equals(out2)  # deterministic
    kept = {}
    for r in out1.to_pylist():
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    # equal input counts (1000 each), weight-2 sources keep ~2x weight-1;
    # weight-2 rate = min(1, 2*4000/(1000*6)) > 1 -> all kept
    assert kept["src1"] == 1000 and kept["src3"] == 1000
    # weight-1 rate = 4000/(1000*6) = 2/3 -> binomial around 667
    for s in ("src0", "src2"):
        assert 560 <= kept[s] <= 780, kept
    del rng


def test_rebalance_equal_weights_keeps_everything():
    rows = [{"doc_id": int(i), "source": f"src{i % 3}"} for i in range(300)]
    out = _tbl(rebalance_sources(_ds(rows), {f"src{i}": 1 for i in range(3)}))
    # uniform counts + uniform weights -> every rate is exactly 1... but the
    # keep test is strict (<), so u*cnt*W < w*total*10000 with cnt*W ==
    # total*w keeps u in [0, 9999) i.e. everything except exact u==... none;
    # equality only when u == 10000 which cannot happen -> all kept iff
    # u*total*... strictly below; u max 9999 < 10000 -> all kept
    assert out.num_rows == 300


def test_top_ngrams_combiner_matches_naive(tmp_path):
    # the distributed combiner/groupby/sort path must equal a naive count
    import collections

    from lamapi_ray.pipelines import extras

    rows = [
        {"doc_id": 0, "text": "a b c a b c a b c", "lang": "en",
         "source": "src0", "n_chars": 17},
        {"doc_id": 1, "text": "a b c d e f", "lang": "en",
         "source": "src1", "n_chars": 11},
        {"doc_id": 2, "text": "x y", "lang": "en", "source": "src0",
         "n_chars": 3},
    ]
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "documents.parquet")
    out = extras.top_ngrams(str(tmp_path))
    # naive: 3-gram hash counts via the same hasher
    from lamapi_ray.stages.dedup import _doc_shingle_hashes

    _, _, g = _doc_shingle_hashes(
        pa.Table.from_pylist(rows), "doc_id", "text", k=3, distinct=False
    )
    want = collections.Counter(int(x) for x in g)
    got = list(zip(out["g"].to_pylist(), out["count"].to_pylist()))
    assert len(got) == min(20, len(want))
    # top entry: "a b c" appears 3x in doc 0 + 1x in doc 1
    assert got[0][1] == 4 and want[got[0][0]] == 4
    # ordering: count desc then hash asc, and counts match the naive counter
    for (g1, c1), (g2, c2) in zip(got, got[1:]):
        assert (c1, -g1) >= (c2, -g2) or c1 > c2 or (c1 == c2 and g1 < g2)
    for gh, c in got:
        assert want[gh] == c


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_gram_stats_invariants(docs_tokens):
    # total = n_tokens-k+1 for docs with >=k tokens, 1 for short non-empty
    # docs, 0 for empty; distinct <= total; top <= total; top >= 1 iff total>0
    from lamapi_ray.stages.curation import _gram_stats

    k = 2
    rows = [
        {"doc_id": i, "text": " ".join(toks)} for i, toks in enumerate(docs_tokens)
    ]
    batch = pa.Table.from_pylist(rows)
    ids, total, distinct, top = _gram_stats(batch, k, "doc_id", "text")
    assert list(ids) == list(range(len(docs_tokens)))
    for i, toks in enumerate(docs_tokens):
        # "" splits to [''] — one token — so n_tok is max(len, 1)
        n_tok = max(len(toks), 1)
        want_total = n_tok - k + 1 if n_tok >= k else 1
        assert total[i] == want_total, (i, toks, total[i])
        assert 0 <= distinct[i] <= total[i]
        assert (top[i] >= 1) == (total[i] > 0)
        assert top[i] <= total[i]


def test_tfidf_top_terms_ranking():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.curation import tfidf_top_terms

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "apple apple apple common",   # apple tf=3 df=1; common df=3
                    "banana banana common common",
                    "apple banana cherry common",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        pa.concat_tables(
            tfidf_top_terms(
                ray.data.from_arrow(docs), topk=2
            ).iter_batches(batch_format="pyarrow", batch_size=1024)
        )
        .sort_by([("doc_id", "ascending"), ("score_fp", "descending")])
        .to_pylist()
    )
    from lamapi_ray.stages.dedup import _hash64_cached

    P = (1 << 61) - 1
    h = lambda t: _hash64_cached(t) % P  # noqa: E731
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc1: apple (tf3 df2 -> 1.5e6) beats common (tf1 df3)
    assert by_doc[1][0]["g"] == h("apple") and by_doc[1][0]["score_fp"] == 3 * 10**6 // 2
    # doc2: banana tf2 df2 -> 1e6; common tf2 df3 -> 666666
    assert by_doc[2][0]["g"] == h("banana")
    assert by_doc[2][1]["score_fp"] == 2 * 10**6 // 3
    # doc3: apple/banana tie at 500000 -> smaller hash first
    g3 = [r["g"] for r in by_doc[3]]
    assert g3 == sorted([h("apple"), h("banana")]) or len(g3) == 2
    assert all(len(v) == 2 for v in by_doc.values())


def test_blocklist_scan_counts_and_flag(ray_session):
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.curation import blocklist_scan

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "slow hash scan merge row row row slow",  # 8 hits
                        "rows contain row inside rowdy words",  # substring hits
                        "nothing listed here",
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    t = pa.concat_tables(
        blocklist_scan(ds).iter_batches(batch_size=64, batch_format="pyarrow")
    ).sort_by("doc_id")
    assert t["n_hits"].to_pylist() == [8, 3, 0]  # 'row' matches inside words
    assert t["blocked"].to_pylist() == [True, False, False]


def test_token_budget_whitespace_rule(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines import extras

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b  c", "  x ", "", "one"], pa.string()),
            "source": pa.array(["s1", "s1", "s2", "s2"], pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = extras.token_budget(str(tmp_path))
    rows = {
        (r["source"], r["split"]): (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in out.to_pylist()
    }
    # totals across splits per source are split-rule independent
    s1 = [v for (s, _), v in rows.items() if s == "s1"]
    s2 = [v for (s, _), v in rows.items() if s == "s2"]
    assert sum(v[0] for v in s1) == 2 and sum(v[0] for v in s2) == 2
    assert sum(v[1] for v in s1) == 3 + 1   # "a b  c" -> 3, "  x " -> 1
    assert sum(v[1] for v in s2) == 0 + 1   # "" -> 0, "one" -> 1
    assert sum(v[2] for v in s1) == 6 + 4
    assert sum(v[2] for v in s2) == 0 + 3


def test_decontaminate_fuzzy_flags_edited_copies(ray_session):
    """Planted ' xx'-edited benchmark copies must flag as contaminated;
    unrelated docs must not; counts match a brute-force signature check."""
    import ray.data

    from lamapi_ray.stages.curation import decontaminate_fuzzy
    from lamapi_ray.stages.dedup import _sig_matrix

    bench = pa.table(
        {
            "doc_id": pa.array([0, 50], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                    "one two three four five six seven eight nine ten",
                ],
                pa.string(),
            ),
        }
    )
    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 2000000, 2000050], pa.int64()),
            "text": pa.array(
                [
                    "completely unrelated text about other things entirely now",
                    "another distinct document with its own word stream here",
                    "alpha beta gamma delta epsilon zeta eta theta iota kappa xx",
                    "one two three four five six seven eight nine ten xx",
                ],
                pa.string(),
            ),
        }
    )
    out = pa.concat_tables(
        decontaminate_fuzzy(
            ray.data.from_arrow(corpus).repartition(2), bench
        ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    ).sort_by("doc_id")
    got = dict(
        zip(out["doc_id"].to_pylist(), out["contaminated"].to_pylist())
    )
    assert got[1] is False and got[2] is False
    assert got[2000000] is True and got[2000050] is True
    # brute-force the >=48 rule for one planted pair
    _, bs = _sig_matrix(bench, "doc_id", "text")
    _, cs = _sig_matrix(corpus, "doc_id", "text")
    assert (cs[2] == bs[0]).sum() >= 48


def test_classifier_pr_curve_invariants(ray_session):
    """Monotone invariants of the sweep: recall non-increasing in the
    threshold, tp+fn constant (= positive count), confusion cells sum to
    the corpus size, f1 consistent with p/r."""
    from lamapi_ray.pipelines.extras import classifier_pr_curve

    out = classifier_pr_curve("/root/testdata/sf0.001")
    assert out.num_rows == 19
    tp = out["tp"].to_pylist()
    fp = out["fp"].to_pylist()
    fn = out["fn"].to_pylist()
    tn = out["tn"].to_pylist()
    rec = out["recall"].to_pylist()
    prec = out["precision"].to_pylist()
    f1 = out["f1"].to_pylist()
    n = tp[0] + fp[0] + fn[0] + tn[0]
    npos = tp[0] + fn[0]
    for i in range(19):
        assert tp[i] + fp[i] + fn[i] + tn[i] == n
        assert tp[i] + fn[i] == npos
        if i:
            assert rec[i] <= rec[i - 1] + 1e-9
        p, r = prec[i], rec[i]
        want = 2 * p * r / (p + r) if p + r > 0 else 0.0
        assert abs(f1[i] - want) < 2e-3  # p/r are rounded displays


def test_calibration_bins_conservation(ray_session):
    """Bin counts sum to the corpus size; positives sum to the en count;
    mean_score lies inside each bin's [lo, hi) range."""
    import duckdb

    from lamapi_ray.pipelines.extras import calibration_bins

    out = calibration_bins("/root/testdata/sf0.001")
    n_docs = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    n_en = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
        " WHERE lang = 'en'"
    ).fetchone()[0]
    assert sum(out["n"].to_pylist()) == n_docs
    assert sum(out["n_pos"].to_pylist()) == n_en
    for i in range(out.num_rows):
        b = out["bin"][i].as_py()
        m = out["mean_score"][i].as_py()
        lo = b / 10.0
        hi = 1.01 if b == 9 else (b + 1) / 10.0  # top bin clips scores >= .9
        assert lo - 1e-6 <= m < hi
        pr = out["pos_rate"][i].as_py()
        assert 0.0 <= pr <= 1.0


def test_lang_confusion_conservation(ray_session):
    """Matrix cells sum to corpus size; per-true-lang rows sum to the
    true-lang counts; diagonal recall = n / row-total."""
    import duckdb

    from lamapi_ray.pipelines.extras import lang_confusion

    out = lang_confusion("/root/testdata/sf0.001")
    n_docs = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert sum(out["n"].to_pylist()) == n_docs
    rows = list(
        zip(out["lang_true"].to_pylist(), out["lang_pred"].to_pylist(),
            out["n"].to_pylist(), out["recall"].to_pylist())
    )
    tot = {}
    for t, _, n, _ in rows:
        tot[t] = tot.get(t, 0) + n
    for t, p, n, r in rows:
        if t == p:
            assert abs(r - n / tot[t]) < 1e-6
        else:
            assert r == 0.0


def test_zipf_slope_planted_powerlaw(ray_session, tmp_path):
    """On a corpus whose token counts are exactly c_r = round(1000·r^-1)
    for ranks 1..50, the fitted slope recovers ≈ -1."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import zipf_slope

    toks = []
    for r in range(1, 51):
        toks.extend([f"tok{r:02d}"] * round(1000 / r))
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(toks)), pa.int64()),
            "text": pa.array(toks, pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    out = zipf_slope(str(d), top_n=50)
    assert out.num_rows == 1
    assert out["n_top"][0].as_py() == 50
    slope = out["slope"][0].as_py()
    assert abs(slope - (-1.0)) < 0.02
    # intercept recovers ln(1000) within rounding of the planted counts
    assert abs(out["intercept"][0].as_py() - math.log(1000)) < 0.05


def test_source_vocab_overlap_crafted(tmp_path, ray_session):
    """Hand-built sources: A={x,y,z}, B={y,z,w}, C={q} → J(A,B)=2/4,
    J(A,C)=J(B,C)=0 (zero-overlap pairs still emitted)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lamapi_ray.pipelines.extras import source_vocab_overlap

    docs = [
        (0, "x y z", "A"), (1, "y x", "A"),
        (2, "y z w", "B"),
        (3, "q", "C"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([d[2] for d in docs], pa.string()),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {(r["source_a"], r["source_b"]): r
           for r in source_vocab_overlap(str(tmp_path)).to_pylist()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (3, 3, 2)
    assert ab["jaccard"] == 0.5
    assert out[("A", "C")]["n_common"] == 0
    assert out[("A", "C")]["jaccard"] == 0.0
    assert out[("B", "C")]["jaccard"] == 0.0
