"""Golden tests for the candidate retrieval + scoring spec (SurfaceIndex).

Hand-built fixture index; expected values computed by hand from the
reference's documented formulas:

* retrieval = token-overlap hits ordered by popularity desc (O1) with
  match-score/id/surface tie-breaks; exact-name boost 2 (F8,
  lookup_retriever.py:283);
* pos_score = (rank+1)/n_hits (grows with WORSE rank — elastic.py:55 quirk
  kept), es_score = match/max_match (O4);
* ed/jaccard/jaccardNgram per F1-F3 with the max-denominator quirk;
* ambiguity_mention = exact-matching distinct ids / distinct ids,
  corrects_tokens = |mention tokens ∩ hit tokens| / |mention tokens| (A5);
* per-entity dedup keeps max (ed+jaccard) (A6).
"""

import pyarrow as pa
import pytest

from lamapi_ray.index.surface import SurfaceIndex


def make_index(rows):
    cols = {
        "id": [], "name": [], "surface_norm": [], "is_alias": [],
        "description": [], "kind": [], "NERtype": [], "types": [],
        "length": [], "ntoken": [], "popularity": [],
    }
    for r in rows:
        cols["id"].append(r["id"])
        cols["name"].append(r["name"])
        cols["surface_norm"].append(r["name"].lower())
        cols["is_alias"].append(r.get("is_alias", False))
        cols["description"].append(r.get("description", ""))
        cols["kind"].append("entity")
        cols["NERtype"].append(r.get("NERtype", "OTHERS"))
        cols["types"].append(r.get("types", "Q100"))
        cols["length"].append(len(r["name"]))
        cols["ntoken"].append(len(r["name"].split(" ")))
        cols["popularity"].append(r["popularity"])
    tbl = pa.table(
        {
            "id": pa.array(cols["id"], pa.string()),
            "name": pa.array(cols["name"], pa.string()),
            "surface_norm": pa.array(cols["surface_norm"], pa.string()),
            "is_alias": pa.array(cols["is_alias"], pa.bool_()),
            "description": pa.array(cols["description"], pa.string()),
            "kind": pa.array(cols["kind"], pa.string()),
            "NERtype": pa.array(cols["NERtype"], pa.string()),
            "types": pa.array(cols["types"], pa.string()),
            "length": pa.array(cols["length"], pa.int64()),
            "ntoken": pa.array(cols["ntoken"], pa.int64()),
            "popularity": pa.array(cols["popularity"], pa.float64()),
        }
    )
    return SurfaceIndex(tbl, {"Q100": "film"})


@pytest.fixture()
def index():
    return make_index(
        [
            {"id": "Q1", "name": "Batman Begins", "popularity": 0.9},
            {"id": "Q2", "name": "Batman", "popularity": 1.0},
            {"id": "Q3", "name": "Batman Returns", "popularity": 0.5},
            {"id": "Q4", "name": "Superman", "popularity": 0.8},
        ]
    )


def test_retrieval_order_popularity_desc(index):
    idx, match = index.retrieve("batman begins")
    norms = [index.norms[i] for i in idx]
    # hits = all surfaces sharing a token with {batman, begins}
    assert set(norms) == {"batman begins", "batman", "batman returns"}
    # O1: popularity desc → batman (1.0) first, then batman begins (0.9)
    assert norms == ["batman", "batman begins", "batman returns"]


def test_match_scores_with_exact_boost(index):
    idx, match = index.retrieve("batman begins")
    by_norm = dict(zip([index.norms[i] for i in idx], match))
    # shared/max(ntokens) — doubled on exact surface match (F8 boost:2)
    assert by_norm["batman begins"] == pytest.approx(2.0)   # 2/2 * 2
    assert by_norm["batman"] == pytest.approx(0.5)          # 1/2
    assert by_norm["batman returns"] == pytest.approx(0.5)  # 1/2


def test_candidate_scores_golden(index):
    cands = {c["id"]: c for c in index.candidates("batman begins")}
    assert set(cands) == {"Q1", "Q2", "Q3"}
    c1 = cands["Q1"]  # exact match
    assert c1["ed_score"] == 1.0
    assert c1["jaccard_score"] == 1.0
    assert c1["jaccardNgram_score"] == 1.0
    assert c1["type_names"] == "film"
    # pos_score grows with worse rank: Q2 is rank 0 (popularity 1.0)
    c2 = cands["Q2"]
    assert c2["pos_score"] == pytest.approx(round(1 / 3, 3))
    assert c1["pos_score"] == pytest.approx(round(2 / 3, 3))
    assert cands["Q3"]["pos_score"] == pytest.approx(1.0)
    # es_score normalized by max match (2.0)
    assert c1["es_score"] == 1.0
    assert c2["es_score"] == pytest.approx(0.25)
    # F2 max-denominator quirk: |{batman} ∩ {batman, begins}| / max(1, 2)
    assert c2["jaccard_score"] == pytest.approx(0.5)
    # A5 ambiguity: 1 exact-matching id of 3 distinct ids
    assert c1["ambiguity_mention"] == pytest.approx(round(1 / 3, 3))
    # A5 corrects: both mention tokens appear among hit tokens
    assert c1["corrects_tokens"] == 1.0


def test_per_entity_dedup_keeps_best(index):
    # same entity under label + alias: dedup keeps max (ed+jaccard)
    idx2 = make_index(
        [
            {"id": "Q9", "name": "NYC", "popularity": 1.0},
            {"id": "Q9", "name": "New York City", "popularity": 1.0, "is_alias": True},
        ]
    )
    cands = idx2.candidates("new york city")
    assert len(cands) == 1
    assert cands[0]["name"] == "New York City"
    assert cands[0]["ed_score"] == 1.0


def test_limit_truncates_hits(index):
    idx, _ = index.retrieve("batman begins", limit=2)
    assert len(idx) == 2
    # truncation keeps the top of the popularity-desc order
    assert [index.norms[i] for i in idx] == ["batman", "batman begins"]


# --- fuzzy + filtered retrieval (F8 fuzziness/filters parity) --------------


def test_auto_fuzz_budgets():
    assert SurfaceIndex.auto_fuzz("ab") == 0
    assert SurfaceIndex.auto_fuzz("abc") == 1
    assert SurfaceIndex.auto_fuzz("abcde") == 1
    assert SurfaceIndex.auto_fuzz("abcdef") == 2


def test_fuzzy_retrieval_matches_one_edit_typo():
    idx = make_index(
        [
            {"id": "Q1", "name": "red plate", "popularity": 0.9},
            {"id": "Q2", "name": "blue cup", "popularity": 0.5},
        ]
    )
    # exact path misses the typo'd token entirely
    hits, _ = idx.retrieve("xred saucer")
    assert len(hits) == 0
    # fuzzy: 'xred' (len 4 → budget 1) matches vocab 'red'
    hits, score = idx.retrieve("xred saucer", fuzzy=True)
    assert list(idx.ids[hits]) == ["Q1"]
    # no exact-name ×2 boost in fuzzy mode
    assert score[0] == pytest.approx(1 / 2)  # 1 shared / max(2, 2)


def test_fuzzy_len3_middle_edit_fallback():
    # 'rxd' vs vocab 'red': the single middle edit destroys BOTH bigrams —
    # only the short-vocab fallback can find it
    idx = make_index([{"id": "Q1", "name": "red plate", "popularity": 0.9}])
    hits, _ = idx.retrieve("rxd", fuzzy=True)
    assert list(idx.ids[hits]) == ["Q1"]


def test_filters_restrict_hits():
    idx = make_index(
        [
            {"id": "Q1", "name": "acme corp", "popularity": 0.9, "NERtype": "ORG"},
            {"id": "Q2", "name": "acme peak", "popularity": 0.5, "NERtype": "LOC"},
        ]
    )
    hits, _ = idx.retrieve("acme")
    assert set(idx.ids[hits]) == {"Q1", "Q2"}
    hits, _ = idx.retrieve("acme", nertype="LOC")
    assert list(idx.ids[hits]) == ["Q2"]
    hits, _ = idx.retrieve("acme", nertype="LOC", kind="type")
    assert len(hits) == 0
    hits, _ = idx.retrieve("acme", types="Q100 Q999")
    assert set(idx.ids[hits]) == {"Q1", "Q2"}
    hits, _ = idx.retrieve("acme", types="Q999")
    assert len(hits) == 0
