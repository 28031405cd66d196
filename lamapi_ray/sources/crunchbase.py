"""Crunchbase second-source pipeline (S2 + M11 + J5, end to end).

Reference: ``scripts/parsing_cb.py`` — two chunked CSV reads (main orgs
file + an additional descriptions/rank file, :94-128), a driver-side
description/popularity join probed per org (:43-46, J5), rows with a NaN
permalink skipped (:121), and per-column literal routing via the
isoparse-based ``classify_value`` (:26-37, M11) into the same items /
literals / types tables the Wikidata ingest feeds.

Ray-Data-first re-expression: ``ray.data.read_csv`` ×2, the (small)
additional file broadcast-joined into every batch, vectorized per-column
classification, and two derived tables:

* items:    (entity, label, description, popularity, kind, NERtype)
* literals: (entity, datatype, column, value)  — exploded, one row per cell

The aliases columns are parsed but dropped exactly like the reference
("aliases": {"en": []} — parsing_cb.py:49-51,67). ``types`` is the
constant P31→Organization map (:42), carried as the items kind/NERtype.

The test/benchmark CSVs are synthesized deterministically from the
``customer`` parquet table (no external data), including a skip-path row
(empty permalink) every 97th customer.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from lamapi_ray.functions.literals import classify_value_cb

LITERAL_COLUMNS = ["founded_on", "employees", "segment"]


def synth_cb_csvs(sf_dir: str) -> tuple[str, str]:
    """Deterministic (main, additional) CSV pair derived from customer.

    main: permalink ('org-<k>', empty every 97th → skip path), name,
    alias1, founded_on (ISO date), employees (int), segment (string).
    additional: permalink, cb_url, description (mktsegment), rank (k%100).
    """
    import pyarrow.parquet as pq

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    main_path = f"/tmp/lamapi_cb_main_{tag}.csv"
    add_path = f"/tmp/lamapi_cb_add_{tag}.csv"
    if os.path.exists(main_path) and os.path.exists(add_path):
        return main_path, add_path
    cust = (
        pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
        )
        .sort_by("c_custkey")
        .to_pylist()
    )
    main_lines = ["permalink,name,alias1,founded_on,employees,segment"]
    add_lines = ["permalink,cb_url,description,rank"]
    for c in cust:
        k = int(c["c_custkey"])
        permalink = "" if k % 97 == 0 else f"org-{k}"
        founded = f"{1990 + k % 30:04d}-{1 + k % 12:02d}-{1 + k % 28:02d}"
        main_lines.append(
            f"{permalink},{c['c_name']},alias-{k},{founded},{k % 5000},{c['c_mktsegment']}"
        )
        add_lines.append(
            f"org-{k},https://cb.example/org-{k},{c['c_mktsegment']},{k % 100}"
        )
    for path, lines in ((main_path, main_lines), (add_path, add_lines)):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    return main_path, add_path


_CB_CACHE: dict[str, dict[str, pa.Table]] = {}


def cb_tables(sf_dir: str) -> dict[str, pa.Table]:
    """Run the CB ingest → {'items': Table, 'literals': Table}."""
    if sf_dir in _CB_CACHE:
        return _CB_CACHE[sf_dir]
    main_path, add_path = synth_cb_csvs(sf_dir)
    main = ray.data.read_csv(main_path)
    add_tbl = pa.concat_tables(
        b
        for b in ray.data.read_csv(add_path).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    ).combine_chunks()
    # J5: the additional file is the broadcast side (driver dict in the
    # reference, parsing_cb.py:43-46; ray.put once here)
    add_ref = ray.put(add_tbl)

    def build(batch: pa.Table) -> pa.Table:
        add = ray.get(add_ref)
        # skip-path: NaN/empty permalink rows dropped (ref :121); CSV
        # readers surface the missing field as null OR empty string
        pl = batch["permalink"]
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        pl = pl.cast(pa.string())
        batch = batch.filter(
            pc.and_(pc.is_valid(pl), pc.not_equal(pc.fill_null(pl, ""), ""))
        )
        joined = batch.join(
            add.rename_columns(["permalink", "cb_url", "cb_description", "rank"]),
            keys=["permalink"],
            join_type="left outer",
        )
        n = len(joined)
        desc = pc.fill_null(joined["cb_description"].cast(pa.string()), "")
        pop = pc.fill_null(joined["rank"].cast(pa.int64()), 0)
        cols = {
            "entity": joined["permalink"].cast(pa.string()),
            "label": joined["name"].cast(pa.string()),
            "description": desc,
            "popularity": pop,
            "kind": pa.array(["entity"] * n, pa.string()),
            "NERtype": pa.array(["ORG"] * n, pa.string()),
        }
        for col in LITERAL_COLUMNS:
            cols[f"__lit_{col}"] = joined[col].cast(pa.string())
        return pa.table(cols)

    built = main.map_batches(build, batch_format="pyarrow").materialize()

    items = pa.concat_tables(
        b
        for b in built.drop_columns(
            [f"__lit_{c}" for c in LITERAL_COLUMNS]
        ).iter_batches(batch_size=65536, batch_format="pyarrow")
    )

    def explode_literals(batch: pa.Table) -> pa.Table:
        ents, dts, cols_out, vals = [], [], [], []
        for col in LITERAL_COLUMNS:
            values = batch[f"__lit_{col}"].to_pylist()
            entities = batch["entity"].to_pylist()
            # per-batch distinct classification (M11) — column domains are
            # type-pure so the classifier runs once per distinct value
            memo: dict[str, str] = {}
            for e, v in zip(entities, values):
                dt = memo.get(v)
                if dt is None:
                    dt = classify_value_cb(v)
                    memo[v] = dt
                ents.append(e)
                dts.append(dt)
                cols_out.append(col)
                vals.append(str(v))
        return pa.table(
            {
                "entity": pa.array(ents, pa.string()),
                "datatype": pa.array(dts, pa.string()),
                "column": pa.array(cols_out, pa.string()),
                "value": pa.array(vals, pa.string()),
            }
        )

    literals = pa.concat_tables(
        b
        for b in built.map_batches(
            explode_literals, batch_format="pyarrow"
        ).iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    out = {"items": items.sort_by("entity"), "literals": literals}
    _CB_CACHE[sf_dir] = out
    return out
