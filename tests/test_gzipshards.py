"""Gzip shard source tests — roundtrip, shard math, separator guard."""

import gzip

import pyarrow as pa
import pytest
import ray.data

from lamapi_ray.sources.gzipshards import read_gzip_shards, write_gzip_shards


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _collect(ds, key="doc_id"):
    return pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by(key)


def test_roundtrip_exact():
    rows = [(i, f"doc {i} body with words") for i in range(137)]
    shards = write_gzip_shards(_docs(rows), shard_size=50)
    st = _collect(shards, key="shard_id")
    assert st["shard_id"].to_pylist() == [0, 1, 2]
    assert st["n_docs"].to_pylist() == [50, 50, 37]
    out = _collect(read_gzip_shards(write_gzip_shards(_docs(rows), shard_size=50)))
    assert out["doc_id"].to_pylist() == [r[0] for r in rows]
    assert out["text"].to_pylist() == [r[1] for r in rows]


def test_payload_is_real_gzip():
    shards = _collect(
        write_gzip_shards(_docs([(0, "hello world")]), shard_size=50),
        key="shard_id",
    )
    blob = shards["payload"][0].as_py()
    assert blob[:2] == b"\x1f\x8b"  # gzip magic
    assert gzip.decompress(blob) == b"0\thello world\n"


def test_separator_guard():
    with pytest.raises(ValueError):
        _collect(write_gzip_shards(_docs([(0, "has\ttab")]), shard_size=50),
                 key="shard_id")
