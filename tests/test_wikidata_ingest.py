"""Wikidata dump ingest parity tests (reference scripts/parse_wikidata_dump.py).

Fixture entities are hand-built to exercise every documented quirk:
popularity floor of 1, P279 → category "type", P-prefix → "predicate",
P106 feeding types under the P31 key, lexeme-family claim skip,
globe-coordinate → "lat,lon", per-language alias dedup, malformed-line skip.
"""

import json

import pyarrow as pa
import pytest
import ray.data

from lamapi_ray.sources.wikidata import (
    check_skip,
    get_value,
    parse_entity,
    read_dump,
    split_tables,
)


def claim(datatype, value, with_datavalue=True):
    snak = {"datatype": datatype}
    if with_datavalue:
        snak["datavalue"] = {"value": value}
    return {"mainsnak": snak}


Q42 = {
    "id": "Q42",
    "labels": {"en": {"value": "Douglas Adams"}, "it": {"value": "Douglas Adams"}},
    "aliases": {"en": [{"value": "DNA"}, {"value": "DNA"}, {"value": "D. Adams"}]},
    "descriptions": {"en": {"value": "author"}, "de": {"value": "Autor"}},
    "sitelinks": {"enwiki": {}, "dewiki": {}, "itwiki": {}},
    "claims": {
        "P31": [claim("wikibase-item", {"id": "Q5"})],
        "P106": [claim("wikibase-item", {"id": "Q36180"})],
        "P69": [claim("wikibase-item", {"id": "Q691283"})],
        "P569": [claim("time", {"time": "+1952-03-11T00:00:00Z"})],
        "P2048": [claim("quantity", {"amount": "+1.96"})],
        "P625": [claim("globe-coordinate", {"latitude": 52.1, "longitude": 0.1})],
        "P1559": [claim("monolingualtext", {"text": "Douglas Adams", "language": "en"})],
        "P9999": [claim("wikibase-lexeme", {"id": "L1"})],          # skipped
        "P8888": [claim("string", "x", with_datavalue=False)],       # skipped
    },
}

Q5 = {
    "id": "Q5",
    "labels": {"en": {"value": "human"}},
    "claims": {"P279": [claim("wikibase-item", {"id": "Q154954"})]},
    "sitelinks": {},
}

P31 = {"id": "P31", "labels": {"en": {"value": "instance of"}}, "claims": {}}


def by_tag(rows, tag):
    return [r for r in rows if r["tag"] == tag]


def test_item_row_quirks():
    rows = parse_entity(Q42)
    item = by_tag(rows, "item")[0]
    assert item["entity"] == "Q42"
    assert item["description"] == "author"          # en only (ref :149)
    assert item["popularity"] == 3                   # len(sitelinks)
    assert item["category"] == "entity"
    # per-language alias dedup keeps first occurrence (ref :158-163)
    assert [a["value"] for a in item["aliases"]] == ["DNA", "D. Adams"]
    assert {l["lang"] for l in item["labels"]} == {"en", "it"}


def test_popularity_floor():
    assert parse_entity(Q5)[0]["popularity"] == 1    # max(len, 1) (ref :151-152)


def test_category_rules():
    assert parse_entity(Q5)[0]["category"] == "type"        # has P279 (ref :165-171)
    assert parse_entity(P31)[0]["category"] == "predicate"  # P-prefix (ref :172-173)


def test_triples_and_types_p106_quirk():
    rows = parse_entity(Q42)
    triples = {(r["entity"], r["pred"], r["obj"]) for r in by_tag(rows, "triple")}
    assert ("Q42", "P31", "Q5") in triples
    assert ("Q42", "P106", "Q36180") in triples
    assert ("Q42", "P69", "Q691283") in triples
    # P31 AND P106 both land in types under the P31 key (ref :217-218)
    types = {(r["entity"], r["pred"], r["obj"]) for r in by_tag(rows, "type")}
    assert types == {("Q42", "P31", "Q5"), ("Q42", "P31", "Q36180")}


def test_literal_routing_and_values():
    rows = parse_entity(Q42)
    lits = {(r["datatype"], r["pred"], r["value"]) for r in by_tag(rows, "literal")}
    assert ("DATETIME", "P569", "+1952-03-11T00:00:00Z") in lits
    assert ("NUMBER", "P2048", "+1.96") in lits
    assert ("STRING", "P625", "52.1,0.1") in lits    # lat,lon (ref :120-123)
    assert ("STRING", "P1559", "Douglas Adams") in lits
    # lexeme + missing-datavalue claims skipped (ref :104-115)
    assert not any(r["pred"] in ("P9999", "P8888") for r in rows)


def test_check_skip_and_get_value():
    assert check_skip({"mainsnak": {}}, "string")
    assert check_skip(claim("wikibase-form", {"id": "F1"}), "wikibase-form")
    assert not check_skip(claim("string", "x"), "string")
    assert get_value("globe-coordinate", {"value": {"latitude": 1.5, "longitude": -2}}) == "1.5,-2"
    assert get_value("quantity", {"value": {"amount": "+7"}}) == "+7"


def test_read_dump_end_to_end(tmp_path):
    dump = tmp_path / "dump.json"
    lines = ["["]
    lines.append(json.dumps(Q42) + ",")
    lines.append(json.dumps(Q5) + ",")
    lines.append("{this is not json},")             # skipped (ref :252-253)
    lines.append(json.dumps(P31) + ",")
    lines.append("]")
    dump.write_text("\n".join(lines))

    tables = split_tables(read_dump(str(dump)))
    items = pa.concat_tables(
        b for b in tables["items"].iter_batches(batch_size=1024, batch_format="pyarrow")
    )
    assert sorted(items["entity"].to_pylist()) == ["P31", "Q42", "Q5"]
    triples = pa.concat_tables(
        b for b in tables["triples"].iter_batches(batch_size=1024, batch_format="pyarrow")
    )
    assert ("Q5", "P279", "Q154954") in {
        (s, p, o)
        for s, p, o in zip(
            triples["entity"].to_pylist(),
            triples["pred"].to_pylist(),
            triples["obj"].to_pylist(),
        )
    }
    lits = pa.concat_tables(
        b for b in tables["literals"].iter_batches(batch_size=1024, batch_format="pyarrow")
    )
    assert lits.num_rows == 4  # Q42's four literal claims
    # parse-error side channel (reference `log` collection parity): the
    # malformed line becomes one tagged error row; table outputs unchanged
    errs = pa.concat_tables(
        b for b in tables["errors"].iter_batches(batch_size=1024, batch_format="pyarrow")
    )
    assert errs.num_rows == 1
    assert errs["description"][0].as_py().startswith("json:")
    assert errs["value"][0].as_py() == "{this is not json}"
