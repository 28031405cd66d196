"""Chunking tests — window/stride math, overlap content, edge cases."""

import pyarrow as pa
import ray.data

from lamapi_ray.stages.chunking import chunk_documents


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _collect(ds):
    return pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])


def test_short_doc_single_chunk():
    out = _collect(chunk_documents(_docs([(0, "a b c")]), window=5, stride=3))
    assert len(out) == 1
    assert out["chunk_text"][0].as_py() == "a b c"
    assert out["n_tokens"][0].as_py() == 3
    assert out["start_tok"][0].as_py() == 0


def test_overlap_and_tail():
    text = " ".join(str(i) for i in range(10))  # 10 tokens
    out = _collect(chunk_documents(_docs([(0, text)]), window=5, stride=3))
    # chunks: [0..4], [3..7], [6..9 (4 toks)] — k = 1 + ceil((10-5)/3) = 3
    assert out["chunk_id"].to_pylist() == [0, 1, 2]
    assert out["start_tok"].to_pylist() == [0, 3, 6]
    assert out["n_tokens"].to_pylist() == [5, 5, 4]
    assert out["chunk_text"].to_pylist() == [
        "0 1 2 3 4",
        "3 4 5 6 7",
        "6 7 8 9",
    ]


def test_exact_window_boundary():
    text = " ".join(str(i) for i in range(5))
    out = _collect(chunk_documents(_docs([(0, text)]), window=5, stride=3))
    assert len(out) == 1  # n == window → exactly one chunk


def test_multiple_docs_vectorized_batch():
    rows = [(i, " ".join(["t"] * (3 + i))) for i in range(20)]
    out = _collect(chunk_documents(_docs(rows), window=8, stride=4))
    for i in range(20):
        n = 3 + i
        k = 1 if n <= 8 else 1 + -(-(n - 8) // 4)
        got = out.filter(pa.compute.equal(out["doc_id"], i))
        assert len(got) == k, (i, n, k, len(got))
        # full coverage: last chunk ends at n
        last = got["start_tok"][-1].as_py() + got["n_tokens"][-1].as_py()
        assert last == n
