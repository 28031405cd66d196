"""Deterministic synthetic KG + pages derivation from the driver's testdata.

The engine's flagship job (per BASELINE.json ``north_rule``) consumes a
Parquet table of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)`` and links mentions against a
Wikidata-style KG. Neither table exists in ``/root/testdata`` directly, so we
*derive both deterministically* from the tables that do exist — every rule
below is simple arithmetic/string concat that the DuckDB oracle SQL in
``__ray_entry__.py`` reproduces exactly, which is what makes the whole KG
pipeline oracle-checkable.

Derivation spec (the single source of truth; oracle SQL mirrors it):

pages (from ``documents`` × ``part``):
    P         = number of parts
    p1        = p_name of  part  (doc_id        % P)
    p2        = p_name of  part  ((doc_id*7+13) % P)
    full_text = text || ' ' || p1 || ' ' || p2 || ' ' || cast(n_chars)
    url       = 'doc://' || doc_id
    warc_ts   = TIMESTAMP '2024-01-01' + doc_id seconds
    html      = utf8('<html><body><p>' || full_text || '</p></body></html>')
    text      = full_text, but NULL when doc_id % 7 == 3  (forces the
                html→text extraction path; invariant: extracted text is
                byte-identical to full_text for every url)
    lang      = documents.lang

kg items (one entity per dimension row; popularity = usage count with the
reference's floor of 1 — parse_wikidata_dump.py:151-152):
    part     p → id 'Q'||(100000+p_partkey)  label p_name       NER OTHERS  type Q9001  pop #lineitems
    supplier s → id 'Q'||(200000+s_suppkey)  label s_name       NER ORG     type Q9002  pop #lineitems
    customer c → id 'Q'||(300000+c_custkey)  label c_name       NER PERS    type Q9003  pop #orders
    nation   n → id 'Q'||(400000+n_nationkey) label n_name      NER LOC     type Q9004  pop #cust+#supp
    region   r → id 'Q'||(500000+r_regionkey) label r_name      NER LOC     type Q9005  pop #nations
    types Q9001..Q9005 (labels part/supplier/customer/nation/region, kind 'type')
    predicates P1..P9, P31, P90 (kind 'predicate')
    parts additionally carry one alias: the reversed two-word name
    ('red plate' → 'plate red') — exercises alias indexing (M6).

kg adjacency triples (reference ``objects`` exploded —
parse_wikidata_dump.py:189-193,214-222):
    (entity,  P31, its type)                       instance-of (P31∪P106 rule)
    (part_i,  P1,  part_j)   i≠j in same l_orderkey (co-order, both directions)
    (supp,    P2,  nation)   s_nationkey
    (cust,    P3,  nation)   c_nationkey
    (nation,  P4,  region)   n_regionkey
    (supp,    P5,  part)     distinct (l_suppkey, l_partkey)

kg literals (reference ``literals`` exploded — parse_wikidata_dump.py:194-198):
    (part, NUMBER, P6, varchar(p_retailprice))
    (supp, NUMBER, P7, varchar(s_acctbal))
    (cust, NUMBER, P8, varchar(c_acctbal))
    (part, STRING, P9, p_brand)

All aggregation steps run as Ray Data pipelines (they are the real, scalable
operators); the final dimension-side assembly is driver-side pyarrow because
the dimension tables are small by construction (document-scale inputs stay in
Datasets end-to-end — see pipelines/).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

PRED_LABELS = {
    "P1": "co-ordered with",
    "P2": "located in",
    "P3": "from nation",
    "P4": "in region",
    "P5": "supplies",
    "P6": "retail price",
    "P7": "account balance",
    "P8": "customer balance",
    "P9": "brand",
    "P31": "instance of",
    "P90": "has value",
}

TYPE_LABELS = {
    "Q9001": "part",
    "Q9002": "supplier",
    "Q9003": "customer",
    "Q9004": "nation",
    "Q9005": "region",
}

_KG_CACHE: dict[str, dict[str, pa.Table]] = {}


def part_entity(partkey: int) -> str:
    return f"Q{100000 + partkey}"


def _collect_arrow(ds: ray.data.Dataset) -> pa.Table:
    return pa.concat_tables(
        b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
    )


def run_cartesian_pairs(k, pack: int):
    """Distinct ordered within-group pairs from sorted packed int64 keys.

    ``k`` is a SORTED, DISTINCT array of ``group·pack + member`` keys. For
    every run of equal group ids, emit all ordered member pairs (a, b) with
    a ≠ b, packed as ``a·pack + b``, deduplicated. Fully vectorized: the
    per-run cartesian expansion is built with repeat/tile index arithmetic
    (no Python loop over groups) — the synth build's widest kernel.
    """
    import numpy as np

    if len(k) == 0:
        return np.empty(0, dtype=np.int64)
    grp = k // pack
    mem = k % pack
    bounds = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1], True])
    counts = np.diff(bounds)  # run length per group
    starts = bounds[:-1]
    rep = np.repeat(counts, counts)  # output-block length per row
    a_idx = np.repeat(np.arange(len(k)), rep)
    total = int(rep.sum())
    block_start = np.cumsum(rep) - rep
    seg = np.arange(total) - np.repeat(block_start, rep)
    b_idx = np.repeat(np.repeat(starts, counts), rep) + seg
    keep = a_idx != b_idx
    return np.unique(mem[a_idx[keep]] * pack + mem[b_idx[keep]])


def _counts(ds: ray.data.Dataset, key: str) -> dict[int, int]:
    """key → row count: per-batch partial counts (combiner inside
    map_batches), merged driver-side — one streaming pass, no shuffle.
    The key domain is dimension-sized (≪ fact rows), so the merged dict is
    small by construction."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch[key].value_counts()
        return pa.table({"k": vc.field("values"), "n": vc.field("counts")})

    out: dict[int, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for k, n in zip(b["k"].to_pylist(), b["n"].to_pylist()):
            out[int(k)] = out.get(int(k), 0) + int(n)
    return out


def pages_dataset(
    sf_dir: str,
    replicate: int = 1,
    text_repeat: int = 1,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """The synthetic web-pages table as a streaming Ray Dataset.

    ``replicate`` > 1 tiles the documents table (with distinct urls/doc ids)
    to scale benchmark input without external data; replica r shifts doc_id
    by ``r * n_docs`` only in the url/ts (same injected parts — the
    canonicalization stage then sees realistic head-key skew).

    ``text_repeat`` > 1 (bench-only) repeats the document body so pages
    carry Common-Crawl-realistic token counts (~50 → ~50·k tokens); the
    injected surface forms and the distinct-token set are unchanged.
    Correctness queries always use the default 1 — the oracle SQL mirrors
    that derivation.
    """
    part_names = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    p_sorted = part_names.sort_by("p_partkey")
    names = p_sorted["p_name"].to_pylist()  # p_partkey is 0..P-1 (verified)
    nparts = len(names)
    names_arr = pa.array(names, type=pa.string())

    # Block count is the load-balancing knob: the downstream scan fuses into
    # the read task, so len(blocks) IS the stage's parallelism. Benchmarks
    # pass ~8 tasks/core; default (None) lets Ray choose.
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", override_num_blocks=override_num_blocks
    )
    if replicate > 1:
        n_docs_total = ds.count()

    def to_pages(batch: pa.Table, id_shift=None) -> pa.Table:
        import numpy as np

        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        p1 = pc.take(names_arr, pa.array(doc_id % nparts))
        p2 = pc.take(names_arr, pa.array((doc_id * 7 + 13) % nparts))
        lit = pc.cast(batch["n_chars"], pa.string())
        body = batch["text"]
        if text_repeat > 1:
            body = pc.binary_join_element_wise(*([body] * text_repeat), " ")
        full_text = pc.binary_join_element_wise(body, p1, p2, lit, " ")
        eff_id = doc_id + id_shift if id_shift is not None else doc_id
        url = pc.binary_join_element_wise(
            pa.array(["doc://"] * len(batch)),
            pc.cast(pa.array(eff_id), pa.string()),
            "",
        )
        warc_ts = pa.array(1704067200_000_000 + eff_id * 1_000_000).cast(
            pa.timestamp("us")
        )
        # html wraps the two injected part names in <a href> anchors whose
        # targets are the SAME deterministic indices (doc_id % P and
        # (doc_id*7+13) % P) — tag-stripping leaves full_text byte-identical
        # (the extract invariant), and the link-graph stage gets a real
        # href surface to parse (linkgraph.py)
        nrows = len(batch)
        k1 = pc.cast(pa.array(doc_id % nparts), pa.string())
        k2 = pc.cast(pa.array((doc_id * 7 + 13) % nparts), pa.string())
        a_open = pa.array(['<a href="doc://'] * nrows)
        a_mid = pa.array(['">'] * nrows)
        a_close = pa.array(["</a>"] * nrows)
        a1 = pc.binary_join_element_wise(a_open, k1, a_mid, p1, a_close, "")
        a2 = pc.binary_join_element_wise(a_open, k2, a_mid, p2, a_close, "")
        html_inner = pc.binary_join_element_wise(body, a1, a2, lit, " ")
        html = pc.cast(
            pc.binary_join_element_wise(
                pa.array(["<html><body><p>"] * nrows),
                html_inner,
                pa.array(["</p></body></html>"] * nrows),
                "",
            ),
            pa.binary(),
        )
        text_out = pc.if_else(
            pa.array(doc_id % 7 == 3),
            pa.scalar(None, type=pa.large_string()),
            pc.cast(full_text, pa.large_string()),
        )
        return pa.table(
            {
                "url": pc.cast(url, pa.string()),
                "warc_ts": warc_ts,
                "html": html,
                "text": text_out,
                "lang": batch["lang"],
            }
        )

    if replicate <= 1:
        return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)

    def to_pages_replicated(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = len(batch)
        tiled = batch.take(pa.array(np.tile(np.arange(n), replicate)))
        shift = np.repeat(
            np.arange(replicate, dtype=np.int64), n
        ) * n_docs_total
        return to_pages(tiled, id_shift=shift)

    return ds.map_batches(
        to_pages_replicated, batch_format="pyarrow", zero_copy_batch=True
    )


def build_kg_tables(sf_dir: str) -> dict[str, pa.Table]:
    """items / triples / literals tables for the derived mini-KG.

    Popularity counts are Ray Data aggregations over the fact tables (the
    scale-bearing part); the dimension-side assembly is driver-local pyarrow
    (dimension tables are small by construction). Cached per sf_dir.
    """
    if sf_dir in _KG_CACHE:
        return _KG_CACHE[sf_dir]

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    )
    part_counts = _counts(li, "l_partkey")
    supp_counts = _counts(li, "l_suppkey")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust_counts = _counts(orders, "o_custkey")

    part = pq.read_table(f"{sf_dir}/part.parquet").sort_by("p_partkey").to_pylist()
    supplier = pq.read_table(f"{sf_dir}/supplier.parquet").sort_by("s_suppkey").to_pylist()
    customer = pq.read_table(f"{sf_dir}/customer.parquet").sort_by("c_custkey").to_pylist()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").sort_by("n_nationkey").to_pylist()
    region = pq.read_table(f"{sf_dir}/region.parquet").sort_by("r_regionkey").to_pylist()

    nation_pop: dict[int, int] = {}
    for c in customer:
        nation_pop[c["c_nationkey"]] = nation_pop.get(c["c_nationkey"], 0) + 1
    for s in supplier:
        nation_pop[s["s_nationkey"]] = nation_pop.get(s["s_nationkey"], 0) + 1

    items: list[dict] = []

    def add(entity, label, aliases, description, types, popularity, category, nertype):
        items.append(
            {
                "entity": entity,
                "label": label,
                "aliases": aliases,
                "description": description,
                "types": types,
                "popularity": max(int(popularity), 1),  # floor of 1, ref :151-152
                "category": category,
                "kind": category,
                "NERtype": nertype,
            }
        )

    for p in part:
        w = p["p_name"].split(" ")
        add(
            part_entity(p["p_partkey"]), p["p_name"], [f"{w[1]} {w[0]}"],
            p["p_type"], ["Q9001"], part_counts.get(p["p_partkey"], 0),
            "entity", "OTHERS",
        )
    for s in supplier:
        add(
            f"Q{200000 + s['s_suppkey']}", s["s_name"], [], "supplier",
            ["Q9002"], supp_counts.get(s["s_suppkey"], 0), "entity", "ORG",
        )
    for c in customer:
        add(
            f"Q{300000 + c['c_custkey']}", c["c_name"], [], c["c_mktsegment"],
            ["Q9003"], cust_counts.get(c["c_custkey"], 0), "entity", "PERS",
        )
    for n in nation:
        add(
            f"Q{400000 + n['n_nationkey']}", n["n_name"], [], "nation",
            ["Q9004"], nation_pop.get(n["n_nationkey"], 0), "entity", "LOC",
        )
    for r in region:
        add(
            f"Q{500000 + r['r_regionkey']}", r["r_name"], [], "region",
            ["Q9005"], len(nation) // len(region) if region else 1, "entity", "LOC",
        )
    for tid, tlabel in TYPE_LABELS.items():
        add(tid, tlabel, [], "type", [], 1, "type", "OTHERS")
    for pid, plabel in PRED_LABELS.items():
        add(pid, plabel, [], "predicate", [], 1, "predicate", "OTHERS")

    items_tbl = pa.Table.from_pylist(
        items,
        schema=pa.schema(
            [
                ("entity", pa.string()),
                ("label", pa.string()),
                ("aliases", pa.list_(pa.string())),
                ("description", pa.string()),
                ("types", pa.list_(pa.string())),
                ("popularity", pa.int64()),
                ("category", pa.string()),
                ("kind", pa.string()),
                ("NERtype", pa.string()),
            ]
        ),
    )

    # --- adjacency triples -------------------------------------------------
    def _edges(subj_pref: int, subj_keys, pred: str, obj_pref: int, obj_keys):
        subj = pc.binary_join_element_wise(
            "Q", pc.cast(pc.add(pa.array(subj_keys, pa.int64()), subj_pref), pa.string()), ""
        )
        obj = pc.binary_join_element_wise(
            "Q", pc.cast(pc.add(pa.array(obj_keys, pa.int64()), obj_pref), pa.string()), ""
        )
        return pa.table(
            {"subj": subj, "pred": pa.array([pred] * len(subj_keys)), "obj": obj}
        )

    edge_tables = [
        pa.table(
            {
                "subj": pa.array(
                    [it["entity"] for it in items for _ in it["types"]], pa.string()
                ),
                "pred": pa.array(
                    ["P31"] * sum(len(it["types"]) for it in items), pa.string()
                ),
                "obj": pa.array(
                    [t for it in items for t in it["types"]], pa.string()
                ),
            }
        ),
        _edges(200000, [s["s_suppkey"] for s in supplier], "P2",
               400000, [s["s_nationkey"] for s in supplier]),
        _edges(300000, [c["c_custkey"] for c in customer], "P3",
               400000, [c["c_nationkey"] for c in customer]),
        _edges(400000, [n["n_nationkey"] for n in nation], "P4",
               500000, [n["n_regionkey"] for n in nation]),
    ]

    # Co-order (P1) edges: distinct (order, part) pairs sharing an order —
    # the one genuinely wide step of the synth build. ONE bucket exchange:
    # per-batch distinct packed (order·2^24 + part) int64 keys tagged with a
    # bucket derived from the order key, groupby(bucket), then a vectorized
    # within-run cartesian expansion per bucket (an order never straddles
    # buckets). Replaces a groupby-distinct + Dataset.join self-join: one
    # shuffle instead of two, no join aggregator actor pool (which cannot
    # even start below ~4 CPUs), and only 8-byte keys on the wire.
    import numpy as np

    _PACK = 1 << 24  # part keys < 16M at any tested sf
    _NBUCK = 32
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def co_batch(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pk = batch["l_partkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = np.unique(ok * _PACK + pk)
        buck = (
            ((k // _PACK).astype(np.uint64) * _MIX) >> np.uint64(56)
        ).astype(np.int64) % _NBUCK
        return pa.table({"k": k, "__bucket": buck})

    def co_pairs(group: pa.Table) -> pa.Table:
        k = np.unique(group["k"].to_numpy(zero_copy_only=False))
        return pa.table({"k": run_cartesian_pairs(k, _PACK)})

    co_ds = (
        li.map_batches(co_batch, batch_format="pyarrow")
        .groupby("__bucket", num_partitions=_NBUCK)
        .map_groups(co_pairs, batch_format="pyarrow")
    )
    co_keys = np.unique(
        _collect_arrow(co_ds)["k"].to_numpy(zero_copy_only=False)
    )
    edge_tables.append(
        _edges(100000, co_keys // _PACK, "P1", 100000, co_keys % _PACK)
    )

    # Supplies (P5): same packed-distinct pattern over (suppkey, partkey).
    def sup_keys(batch: pa.Table) -> pa.Table:
        key = pc.add(
            pc.multiply(batch["l_suppkey"].cast(pa.int64()), _PACK),
            batch["l_partkey"].cast(pa.int64()),
        )
        return pa.table({"k": pc.unique(key.combine_chunks())})

    sup_keys_arr = np.unique(
        _collect_arrow(li.map_batches(sup_keys, batch_format="pyarrow"))[
            "k"
        ].to_numpy(zero_copy_only=False)
    )
    edge_tables.append(
        _edges(200000, sup_keys_arr // _PACK, "P5", 100000, sup_keys_arr % _PACK)
    )

    all_edges = pa.concat_tables(
        [t.cast(edge_tables[0].schema) for t in edge_tables]
    )
    triples_tbl = (
        all_edges.group_by(["subj", "pred", "obj"])
        .aggregate([])
        .sort_by([("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")])
    )

    # --- literal triples ---------------------------------------------------
    lit_rows = []
    for p in part:
        lit_rows.append((part_entity(p["p_partkey"]), "NUMBER", "P6", str(p["p_retailprice"])))
        lit_rows.append((part_entity(p["p_partkey"]), "STRING", "P9", p["p_brand"]))
    for s in supplier:
        lit_rows.append((f"Q{200000 + s['s_suppkey']}", "NUMBER", "P7", str(s["s_acctbal"])))
    for c in customer:
        lit_rows.append((f"Q{300000 + c['c_custkey']}", "NUMBER", "P8", str(c["c_acctbal"])))
    literals_tbl = pa.table(
        {
            "entity": pa.array([r[0] for r in lit_rows], pa.string()),
            "datatype": pa.array([r[1] for r in lit_rows], pa.string()),
            "pred": pa.array([r[2] for r in lit_rows], pa.string()),
            "value": pa.array([r[3] for r in lit_rows], pa.string()),
        }
    )

    out = {"items": items_tbl, "triples": triples_tbl, "literals": literals_tbl}
    _KG_CACHE[sf_dir] = out
    return out
