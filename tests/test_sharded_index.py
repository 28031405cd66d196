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


def test_sharded_rejects_fuzzy(ray_session):
    kg = synth.build_kg_tables(SF)
    ctx = KGContext(kg["items"], kg["triples"])
    dm = ray.data.from_arrow(pa.table({"mention": pa.array(["red plate"])}))
    with pytest.raises(NotImplementedError):
        generate_candidates_sharded(
            dm, ctx.surface_forms, ctx.type_names, retrieve_kwargs={"fuzzy": True}
        )
