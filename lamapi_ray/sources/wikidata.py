"""Wikidata JSON dump ingest — the reference's offline KG build, Ray-native.

Re-derives (from observed behavior, no code copy) the reference's
``scripts/parse_wikidata_dump.py``:

* S1 dump reader (:43,238-261): the dump is a JSON array with one entity per
  line; each line ends with ``,\\n`` (stripped), bare ``[`` / ``]`` lines and
  undecodable lines are skipped silently (:252-253).
* M1 ``parse_data`` (:145-235): per entity emit
  - labels per language (:154-157), aliases per language deduped (:158-163),
  - English description (:149),
  - ``popularity = max(len(sitelinks), 1)`` (:151-152 — floor of 1 kept on
    purpose),
  - ``category``: "type" if the entity has any P279 claim (:165-171),
    "predicate" if the id starts with P (:172-173), else "entity",
  - claims walk (:206-229): ``wikibase-item`` / ``wikibase-property`` values
    become entity→entity edges (the ``objects`` adjacency, exploded here to
    (subj, pred, obj) triples); P31 *and* P106 additionally feed the types
    table under the P31 key (:217-218 — quirk kept); every other datatype is
    routed through the datatype map (M4, :77-91) into the literals table.
* M2 ``check_skip`` (:104-115): claims with no ``datavalue`` or datatype in
  {wikibase-lexeme, wikibase-form, wikibase-sense} are dropped.
* M3 ``get_value`` (:118-135): globe-coordinate → ``"lat,lon"`` string
  (:120-123), quantity → amount, monolingualtext → text, time → time,
  everything else the raw value.

Pipeline shape: ``ray.data.read_text`` (or ``from_items`` for in-memory
fixtures) → one ``map_batches`` pass per batch emitting a tagged union of
the four logical tables → cheap filtered projections. The per-line JSON
parse + claim walk is embarrassingly parallel; the only shuffles are
whatever downstream consumers ask for.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from lamapi_ray.functions.literals import WIKIDATA_DATATYPE_MAP

_SKIP_DATATYPES = {"wikibase-lexeme", "wikibase-form", "wikibase-sense"}

_TAGGED_SCHEMA = pa.schema(
    [
        ("tag", pa.string()),  # item | triple | literal | type | mapping | error
        ("entity", pa.string()),
        ("description", pa.string()),
        ("labels", pa.list_(pa.struct([("lang", pa.string()), ("value", pa.string())]))),
        ("aliases", pa.list_(pa.struct([("lang", pa.string()), ("value", pa.string())]))),
        ("popularity", pa.int64()),
        ("category", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("datatype", pa.string()),
        ("value", pa.string()),
    ]
)


def check_skip(claim: dict, datatype: str | None) -> bool:
    """M2 — drop claims without a datavalue or with lexeme-family datatypes
    (reference parse_wikidata_dump.py:104-115)."""
    mainsnak = claim.get("mainsnak", {})
    if "datavalue" not in mainsnak:
        return True
    return datatype in _SKIP_DATATYPES


def get_value(datatype: str, datavalue: dict):
    """M3 — datatype-specific value extraction (reference :118-135)."""
    value = datavalue.get("value")
    if datatype == "globe-coordinate":
        return f"{value['latitude']},{value['longitude']}"
    if datatype == "quantity":
        return value["amount"]
    if datatype == "monolingualtext":
        return value["text"]
    if datatype == "time":
        return value["time"]
    return value


def parse_entity(entity: dict) -> list[dict]:
    """M1 — one dump entity → tagged rows for the 4 logical tables."""
    eid = entity.get("id")
    if not eid:
        return []
    labels = [
        {"lang": lang, "value": rec.get("value")}
        for lang, rec in sorted((entity.get("labels") or {}).items())
    ]
    aliases = []
    for lang, recs in sorted((entity.get("aliases") or {}).items()):
        seen: set[str] = set()
        for rec in recs or []:
            v = rec.get("value")
            if v is not None and v not in seen:  # per-lang dedup (ref :158-163)
                seen.add(v)
                aliases.append({"lang": lang, "value": v})
    desc = ((entity.get("descriptions") or {}).get("en") or {}).get("value")
    popularity = max(len(entity.get("sitelinks") or {}), 1)  # floor (ref :151-152)

    claims = entity.get("claims") or {}
    category = "entity"
    if "P279" in claims and claims["P279"]:  # any subclass-of claim (ref :165-171)
        category = "type"
    if eid.startswith("P"):  # property entities (ref :172-173)
        category = "predicate"

    base = {
        "description": None,
        "labels": None,
        "aliases": None,
        "popularity": None,
        "category": None,
        "pred": None,
        "obj": None,
        "datatype": None,
        "value": None,
    }
    rows: list[dict] = [
        {
            **base,
            "tag": "item",
            "entity": eid,
            "description": desc,
            "labels": labels,
            "aliases": aliases,
            "popularity": popularity,
            "category": category,
        }
    ]
    # mappings crosswalk from the enwiki sitelink title (the reference keeps
    # a curid/wikipedia/dbpedia crosswalk collection —
    # parse_wikidata_dump.py:17); entities without an enwiki sitelink have
    # no crosswalk row
    title = (((entity.get("sitelinks") or {}).get("enwiki")) or {}).get("title")
    if title:
        rows.append({**base, "tag": "mapping", "entity": eid, "value": title})
    for pid, claim_list in sorted(claims.items()):
        for claim in claim_list or []:
            mainsnak = claim.get("mainsnak", {})
            datatype = mainsnak.get("datatype")
            if check_skip(claim, datatype):
                continue
            datavalue = mainsnak["datavalue"]
            if datatype in ("wikibase-item", "wikibase-property"):
                target = (datavalue.get("value") or {}).get("id")
                if not target:
                    continue
                rows.append(
                    {**base, "tag": "triple", "entity": eid, "pred": pid, "obj": target}
                )
                if pid in ("P31", "P106"):  # P106 feeds types.P31 (ref :217-218)
                    rows.append(
                        {**base, "tag": "type", "entity": eid, "pred": "P31", "obj": target}
                    )
            else:
                family = WIKIDATA_DATATYPE_MAP.get(datatype)
                if family is None:
                    continue
                rows.append(
                    {
                        **base,
                        "tag": "literal",
                        "entity": eid,
                        "datatype": family,
                        "pred": pid,
                        "value": str(get_value(datatype, datavalue)),
                    }
                )
    return rows


def _parse_lines_batch(batch: pa.Table) -> pa.Table:
    rows: list[dict] = []
    for line in batch["text"].to_pylist():
        line = line.strip()
        if line in ("[", "]", ""):
            continue
        if line.endswith(","):  # trailing comma per dump line (ref :243)
            line = line[:-1]
        try:
            entity = json.loads(line)
        except json.JSONDecodeError as err:
            # parse-error side channel (reference logs failures to a `log`
            # collection, parse_wikidata_dump.py:55,254-256): emit a tagged
            # error row instead of a silent skip; the table outputs are
            # unchanged and the error stream is a cheap filtered view
            rows.append(
                {
                    "tag": "error",
                    "entity": "",
                    "description": f"json: {err}",
                    "value": line[:200],
                }
            )
            continue
        try:
            rows.extend(parse_entity(entity))
        except Exception as err:  # per-entity failures (ref :254-256)
            rows.append(
                {
                    "tag": "error",
                    "entity": str(entity.get("id", "")) if isinstance(entity, dict) else "",
                    "description": f"parse: {err}",
                    "value": line[:200],
                }
            )
    return pa.Table.from_pylist(rows, schema=_TAGGED_SCHEMA)


def read_dump(path: str) -> ray.data.Dataset:
    """S1 — dump file (json-lines / .bz2 handled by Arrow codecs where the
    extension allows; plain text otherwise) → tagged parse output."""
    ds = ray.data.read_text(path)
    return ds.map_batches(_parse_lines_batch, batch_format="pyarrow")


def split_tables(tagged: ray.data.Dataset) -> dict[str, ray.data.Dataset]:
    """Tagged parse output → the 4 logical table views (lazy projections)."""

    def proj(tag: str, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            flt = batch.filter(pa.compute.equal(batch["tag"], tag))
            return flt.select(cols)

        return fn

    return {
        "items": tagged.map_batches(
            proj("item", ["entity", "description", "labels", "aliases",
                          "popularity", "category"]),
            batch_format="pyarrow",
        ),
        "triples": tagged.map_batches(
            proj("triple", ["entity", "pred", "obj"]), batch_format="pyarrow"
        ),
        "literals": tagged.map_batches(
            proj("literal", ["entity", "datatype", "pred", "value"]),
            batch_format="pyarrow",
        ),
        "types": tagged.map_batches(
            proj("type", ["entity", "pred", "obj"]), batch_format="pyarrow"
        ),
        "mappings": tagged.map_batches(
            proj("mapping", ["entity", "value"]), batch_format="pyarrow"
        ),
        "errors": tagged.map_batches(
            proj("error", ["entity", "description", "value"]),
            batch_format="pyarrow",
        ),
    }
