"""Sharded surface-index path ≡ broadcast path (hash-equal outputs)."""

import pyarrow as pa
import pytest
import ray.data

from lamapi_ray import synth
from lamapi_ray.pipelines.kg import KGContext, distinct_mentions, mention_rows, run_pipeline
from lamapi_ray.stages.candidates import generate_candidates
from lamapi_ray.stages.candidates_sharded import (
    build_shard_tables,
    generate_candidates_sharded,
    token_shard,
)

SF = "/root/testdata/sf0.001"


def _collect(ds):
    batches = [b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    return pa.concat_tables(batches) if batches else None


def _sorted(tbl: pa.Table) -> pa.Table:
    return tbl.sort_by([(c, "ascending") for c in ["mention", "id", "name"]])


def test_shard_tables_cover_all_tokens(ray_session):
    kg = synth.build_kg_tables(SF)
    ctx = KGContext(kg["items"], kg["triples"])
    shards = build_shard_tables(ctx.surface_forms, 4)
    # every (token, row) posting must live in exactly the token's shard
    for s, tbl in enumerate(shards):
        for norm in tbl["surface_norm"].to_pylist():
            assert any(token_shard(t, 4) == s for t in norm.split(" "))
    total = sum(len(t) for t in shards)
    assert total >= len(ctx.surface_forms)  # replication ≥ 1 shard per row


def test_sharded_candidates_match_broadcast(ray_session):
    kg = synth.build_kg_tables(SF)
    ctx = KGContext(kg["items"], kg["triples"])
    pages = synth.pages_dataset(SF)
    rows = mention_rows(pages, ctx).materialize()
    dm = distinct_mentions(rows).materialize()

    bc = _sorted(_collect(generate_candidates(dm, ctx.surface_forms, ctx.type_names, limit=5000)))
    sh = _sorted(
        _collect(
            generate_candidates_sharded(
                dm, ctx.surface_forms, ctx.type_names, limit=5000, num_shards=4
            )
        )
    )
    assert bc.num_rows == sh.num_rows
    assert bc.schema.names == sh.schema.names
    assert bc.equals(sh), "sharded path must reproduce broadcast candidates exactly"


def test_sharded_e2e_triples_match(ray_session):
    kg = synth.build_kg_tables(SF)
    pages = synth.pages_dataset(SF)
    res_b = run_pipeline(pages, KGContext(kg["items"], kg["triples"]), limit=5000)
    tb = _collect(res_b["triples"]).sort_by(
        [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")]
    )
    pages2 = synth.pages_dataset(SF)
    res_s = run_pipeline(
        pages2,
        KGContext(kg["items"], kg["triples"], index_strategy="sharded", num_shards=4),
        limit=5000,
    )
    ts = _collect(res_s["triples"]).sort_by(
        [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")]
    )
    assert tb.equals(ts)


def test_sharded_keeps_norm_colliding_surface_rows_separate(ray_session):
    # Regression: two DISTINCT surface rows of one entity ("A  B" label vs
    # "A B" alias) share a surface_norm after clean_str; the sharded merge
    # used to key partials on (id, norm) and collapse them, inflating the
    # shared count and changing hit-list length vs the broadcast path.
    kg = synth.build_kg_tables(SF)
    ctx = KGContext(kg["items"], kg["triples"])
    base = ctx.surface_forms
    extra = pa.table(
        {
            "id": pa.array(["Q900001", "Q900001"]),
            "name": pa.array(["Red  Plate", "Red Plate"]),
            "surface_norm": pa.array(["red plate", "red plate"]),
            "is_alias": pa.array([False, True]),
            "description": pa.array(["d", "d"]),
            "kind": pa.array(["entity", "entity"]),
            "NERtype": pa.array(["OTHERS", "OTHERS"]),
            "types": pa.array(["", ""]),
            "ntoken": pa.array([2, 2], pa.int64()),
            "length": pa.array([10, 9], pa.int64()),
            "popularity": pa.array([0.5, 0.5], pa.float64()),
        }
    )
    sf = pa.concat_tables([base.select(extra.column_names), extra])
    dm = ray.data.from_arrow(pa.table({"mention": pa.array(["red plate"])}))
    bc = _sorted(_collect(generate_candidates(dm, sf, ctx.type_names, limit=5000)))
    dm2 = ray.data.from_arrow(pa.table({"mention": pa.array(["red plate"])}))
    sh = _sorted(
        _collect(
            generate_candidates_sharded(dm2, sf, ctx.type_names, limit=5000, num_shards=4)
        )
    )
    # A6 keeps one best candidate per entity, so one Q900001 row survives —
    # but the two physical rows must stay separate THROUGH scoring: the old
    # (id, norm) merge summed both rows' partial shared counts into one row
    # (match_score 2.0 instead of 1.0) and shrank the hit list (changing
    # pos_score for every candidate), so table equality is the regression
    # signal.
    assert sum(1 for i in bc["id"].to_pylist() if i == "Q900001") == 1
    assert bc.equals(sh)


def test_delete_variant_routing_guarantee():
    # symmetric-delete property: tokens within edit distance k share a
    # common <=k-delete variant, so their shard sets intersect
    from lamapi_ray.functions.text import levenshtein
    from lamapi_ray.stages.candidates_sharded import (
        _MAX_FUZZ,
        delete_variants,
        fuzzy_token_shards,
        token_shard,
    )

    assert "plate" in delete_variants("plate", 2)
    assert "pate" in delete_variants("plate", 1)
    pairs = [("plate", "xplate"), ("plate", "platte"), ("plate", "plte"),
             ("bolt", "bolts"), ("widget", "widgett"), ("widget", "wdget")]
    for a, b in pairs:
        k = max(1, levenshtein(a, b))
        # guarantee: a's query shards (budget k) include a shard where b's
        # index-side (<=_MAX_FUZZ-delete) replication lands
        idx_shards = {token_shard(d, 4) for d in delete_variants(b, _MAX_FUZZ)}
        assert fuzzy_token_shards(a, k, 4) & idx_shards


def test_sharded_fuzzy_matches_broadcast(ray_session):
    # fuzzy + term filters: the sharded deletion-neighborhood path must
    # reproduce the broadcast fuzzy candidate table exactly (incl. scores,
    # which depend on correctly OR-merged shared counts)
    kg = synth.build_kg_tables(SF)
    ctx = KGContext(kg["items"], kg["triples"])
    base = [m for m in ctx.surface_forms["surface_norm"].to_pylist()[:12]]
    typo = sorted({("x" + m) for m in base})  # 1-edit typos (prepended char)
    dm = ray.data.from_arrow(pa.table({"mention": pa.array(typo)}))
    bc = _sorted(
        _collect(
            generate_candidates(
                dm, ctx.surface_forms, ctx.type_names, limit=5000,
                retrieve_kwargs={"fuzzy": True},
            )
        )
    )
    dm2 = ray.data.from_arrow(pa.table({"mention": pa.array(typo)}))
    sh = _sorted(
        _collect(
            generate_candidates_sharded(
                dm2, ctx.surface_forms, ctx.type_names, limit=5000,
                num_shards=4, retrieve_kwargs={"fuzzy": True},
            )
        )
    )
    assert bc.num_rows > 0  # typos actually retrieve fuzzy hits
    assert bc.num_rows == sh.num_rows
    assert bc.equals(sh), "sharded fuzzy must reproduce broadcast fuzzy exactly"


def test_bm25_formula_and_ordering(ray_session):
    # hand-built index: tf>1, df variation, dl variation — check the exact
    # Lucene BM25 value and the relevance ordering
    import math

    import numpy as np

    from lamapi_ray.index.surface import SurfaceIndex

    sf = pa.table(
        {
            "id": pa.array(["Q1", "Q2", "Q3"]),
            "name": pa.array(["apple apple pie", "apple", "banana split pie"]),
            "surface_norm": pa.array(["apple apple pie", "apple", "banana split pie"]),
            "is_alias": pa.array([False, False, False]),
            "description": pa.array(["", "", ""]),
            "kind": pa.array(["entity"] * 3),
            "NERtype": pa.array(["OTHERS"] * 3),
            "types": pa.array([""] * 3),
            "ntoken": pa.array([3, 1, 3], pa.int64()),
            "length": pa.array([15, 5, 16], pa.int64()),
            "popularity": pa.array([0.1, 0.9, 0.5], pa.float64()),
        }
    )
    index = SurfaceIndex(sf, {})
    idx, sc = index.bm25_hits("apple pie", limit=10)
    ids = [index.ids[i] for i in idx]
    assert set(ids) == {"Q1", "Q2", "Q3"}
    N, avgdl, k1, b = 3, 7 / 3, 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want = {
        "Q1": bm25(2, 2, 3) + bm25(1, 2, 3),  # apple tf=2 + pie tf=1
        "Q2": bm25(1, 2, 1),
        "Q3": bm25(1, 2, 3),
    }
    got = dict(zip(ids, sc))
    for q in want:
        assert got[q] == pytest.approx(want[q], rel=1e-12), q
    # ordering: scores descending
    assert list(sc) == sorted(sc, reverse=True)


def test_lucene_byte4_roundtrip_golden():
    # golden values from Lucene core util/SmallFloat.java:
    # intToByte4 stores 0..23 raw (NUM_FREE_VALUES = 255 - longToInt4(MAX_INT)
    # = 255 - 231 = 24); above that only the top 4 significant bits survive
    import numpy as np

    from lamapi_ray.index.surface import lucene_byte4_roundtrip

    # 0..23 raw, and 24..39 exact too (m = n-24 < 16 has <= 4 sig bits)
    raw = np.arange(0, 40, dtype=np.int64)
    assert (lucene_byte4_roundtrip(raw) == raw).all()
    golden = {24: 24, 25: 25, 31: 31, 39: 39, 40: 40, 41: 40, 43: 42,
              44: 44, 55: 54, 56: 56, 100: 96, 127: 120, 128: 128,
              152: 152, 1000: 984, 2**20 + 12345: 2**20 + 24}
    got = lucene_byte4_roundtrip(np.array(sorted(golden), dtype=np.int64))
    assert dict(zip(sorted(golden), got.tolist())) == golden
    # monotone non-decreasing (order-preserving encoding)
    big = np.arange(0, 5000, dtype=np.int64)
    rt = lucene_byte4_roundtrip(big)
    assert (np.diff(rt) >= 0).all() and (rt <= big).all()


def test_bm25_dl_uses_lucene_norm_quantization(ray_session):
    # a 43-token name must be scored with dl=42 (byte4 round-trip: m=19
    # keeps top 4 significant bits → 18), while avgdl stays the exact
    # mean — mirrors Lucene BM25Similarity
    import math

    from lamapi_ray.index.surface import SurfaceIndex

    long_name = " ".join(["w%d" % i for i in range(42)] + ["apple"])
    sf = pa.table(
        {
            "id": pa.array(["Q1", "Q2"]),
            "name": pa.array([long_name, "apple"]),
            "surface_norm": pa.array([long_name, "apple"]),
            "is_alias": pa.array([False, False]),
            "description": pa.array(["", ""]),
            "kind": pa.array(["entity"] * 2),
            "NERtype": pa.array(["OTHERS"] * 2),
            "types": pa.array([""] * 2),
            "ntoken": pa.array([43, 1], pa.int64()),
            "length": pa.array([len(long_name), 5], pa.int64()),
            "popularity": pa.array([0.1, 0.9], pa.float64()),
        }
    )
    index = SurfaceIndex(sf, {})
    idx, sc = index.bm25_hits("apple", limit=10)
    got = {index.ids[i]: s for i, s in zip(idx, sc)}
    N, avgdl, k1, b = 2, 22.0, 1.2, 0.75  # avgdl exact: (43+1)/2
    idf = math.log(1 + (N - 2 + 0.5) / (2 + 0.5))
    want_q1 = idf * 1 * (k1 + 1) / (1 + k1 * (1 - b + b * 42.0 / avgdl))  # dl 43→42
    want_q2 = idf * 1 * (k1 + 1) / (1 + k1 * (1 - b + b * 1.0 / avgdl))
    assert got["Q1"] == pytest.approx(want_q1, rel=1e-12)
    assert got["Q2"] == pytest.approx(want_q2, rel=1e-12)
