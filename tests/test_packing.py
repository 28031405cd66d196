"""Sequence-packing tests — greedy recurrence, truncation, bucket
independence."""

import pyarrow as pa
import ray.data

from lamapi_ray.stages.packing import pack_sequences


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
    t = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    return t.sort_by("doc_id")


def test_greedy_fill_and_new_bin():
    # capacity 5: [3, 2] fill bin 0 exactly; next 1 opens bin 1
    rows = [(0, "a b c"), (1, "a b"), (2, "a"), (3, "a b c d")]
    out = _collect(pack_sequences(_docs(rows), capacity=5, bucket_size=64))
    assert out["seq_id"].to_pylist() == [0, 0, 1, 1]
    assert out["offset"].to_pylist() == [0, 3, 0, 1]
    assert out["n_tokens"].to_pylist() == [3, 2, 1, 4]
    assert out["truncated"].to_pylist() == [False] * 4


def test_truncation_to_capacity():
    rows = [(0, " ".join(["x"] * 10)), (1, "y")]
    out = _collect(pack_sequences(_docs(rows), capacity=4, bucket_size=64))
    assert out["n_tokens"].to_pylist() == [4, 1]
    assert out["truncated"].to_pylist() == [True, False]
    # truncated doc fills bin 0 exactly; next doc opens bin 1
    assert out["seq_id"].to_pylist() == [0, 1]


def test_bucket_independence():
    # doc 63 and 64 land in different buckets: each bucket restarts at seq 0
    rows = [(63, "a b"), (64, "c d"), (65, "e")]
    out = _collect(pack_sequences(_docs(rows), capacity=5, bucket_size=64))
    by_id = dict(zip(out["doc_id"].to_pylist(), zip(
        out["bucket"].to_pylist(), out["seq_id"].to_pylist(), out["offset"].to_pylist()
    )))
    assert by_id[63] == (0, 0, 0)
    assert by_id[64] == (1, 0, 0)
    assert by_id[65] == (1, 0, 2)


def test_pack_split_segments():
    from lamapi_ray.stages.packing import pack_split_sequences

    # capacity 5; docs of 3, 4, 2 tokens → stream positions [0,3), [3,7), [7,9)
    rows = [(0, "a b c"), (1, "d e f g"), (2, "h i")]
    out = _collect(pack_split_sequences(_docs(rows), capacity=5, bucket_size=64))
    out = out.sort_by([("doc_id", "ascending"), ("seq_id", "ascending")])
    # doc 0: seq 0 only; doc 1: crosses seq 0/1 (g 3..7); doc 2: seq 1
    recs = list(
        zip(
            out["doc_id"].to_pylist(), out["seq_id"].to_pylist(),
            out["offset"].to_pylist(), out["tok_start"].to_pylist(),
            out["n_tokens"].to_pylist(),
        )
    )
    assert recs == [
        (0, 0, 0, 0, 3),
        (1, 0, 3, 0, 2),  # first 2 tokens fill seq 0
        (1, 1, 0, 2, 2),  # remaining 2 tokens open seq 1
        (2, 1, 2, 0, 2),
    ]
    # conservation: every doc's segments cover all its tokens exactly once
    import collections

    tot = collections.Counter()
    for d, _, _, _, n in recs:
        tot[d] += n
    assert tot == {0: 3, 1: 4, 2: 2}


def test_pack_split_long_doc_spans_many():
    from lamapi_ray.stages.packing import pack_split_sequences

    rows = [(0, " ".join(["x"] * 13))]
    out = _collect(pack_split_sequences(_docs(rows), capacity=4, bucket_size=64))
    out = out.sort_by([("doc_id", "ascending"), ("seq_id", "ascending")])
    assert out["seq_id"].to_pylist() == [0, 1, 2, 3]
    assert out["n_tokens"].to_pylist() == [4, 4, 4, 1]
    assert out["tok_start"].to_pylist() == [0, 4, 8, 12]
    assert out["offset"].to_pylist() == [0, 0, 0, 0]


def test_order_is_by_doc_id_within_bucket():
    # rows arrive shuffled; packing must walk doc_id order
    rows = [(2, "a a a"), (0, "b b b"), (1, "c c c")]
    out = _collect(pack_sequences(_docs(rows), capacity=6, bucket_size=64))
    assert out["doc_id"].to_pylist() == [0, 1, 2]
    assert out["seq_id"].to_pylist() == [0, 0, 1]
    assert out["offset"].to_pylist() == [0, 3, 0]
