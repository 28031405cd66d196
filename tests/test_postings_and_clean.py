"""Inverted-index construction (index/postings.py) + text_clean."""

import pyarrow as pa

from lamapi_ray.index.postings import term_doc_pairs


def test_term_doc_pairs_distinct_per_doc():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b a", "b c"], pa.string()),
        }
    )
    t = term_doc_pairs(batch)
    pairs = set(zip(t["doc_id"].to_pylist(), t["g"].to_pylist()))
    # doc 1: {a, b} (the repeated 'a' deduped), doc 2: {b, c}
    assert len(pairs) == 4 == len(t)
    by_doc = {}
    for d, g in pairs:
        by_doc.setdefault(d, set()).add(g)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2
    # 'b' hash shared across both docs
    assert by_doc[1] & by_doc[2]


def test_inverted_index_end_to_end(ray_session):
    import ray

    from lamapi_ray.index.postings import inverted_index

    docs = pa.table(
        {
            "doc_id": pa.array([10, 20, 30, 40], pa.int64()),
            "text": pa.array(
                ["x y", "x z", "x y", "q"], pa.string()
            ),
        }
    )
    ds = ray.data.from_arrow(docs)
    out = pa.concat_tables(
        ray.get(r) for r in inverted_index(ds, min_df=2).to_arrow_refs()
    )
    rows = {
        r["df"]: r["postings"]
        for r in out.to_pylist()
    }
    # x: df=3 in docs 10,20,30 (sorted); y: df=2 in 10,30; z and q pruned
    assert len(out) == 2
    assert rows[3] == "10,20,30"
    assert rows[2] == "10,30"


def test_clean_text_rules(ray_session):
    import ray

    from lamapi_ray.stages.curation import clean_text

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "  hello\t\tworld \n",
                    "a\x00b\x1fc",
                    "cafe\u0301",  # decomposed: e + combining acute -> NFC
                ],
                pa.string(),
            ),
        }
    )
    out = pa.concat_tables(
        ray.get(r)
        for r in clean_text(ray.data.from_arrow(docs)).to_arrow_refs()
    ).sort_by("doc_id")
    texts = out["text_clean"].to_pylist()
    assert texts[0] == "hello world"
    assert texts[1] == "abc"
    assert texts[2] == "caf\u00e9"
    assert out["n_chars_clean"].to_pylist() == [11, 3, 4]
