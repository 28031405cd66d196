"""WARC shard source (sources/warc.py): member splitting, record parse,
byte-exact roundtrip, deterministic blobs."""

import gzip

import pyarrow as pa
import ray.data

from lamapi_ray.sources.warc import (
    _parse_record,
    _record,
    _split_members,
    read_warc_shards,
    write_warc_shards,
)


def _pages(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
            }
        )
    ).repartition(2)


ROWS = [
    ("doc://0", 1704067200, b"<html><body><p>zero</p></body></html>"),
    ("doc://1", 1704067201, b"<html>\r\nCRLF inside body \x00\xff</html>"),
    ("doc://7", 1704067207, b""),
    ("doc://52", 1704067252, b"<html>second shard</html>"),
]


def test_roundtrip_byte_exact(ray_session):
    shards = write_warc_shards(_pages(ROWS), shard_size=50)
    got = pa.concat_tables(
        read_warc_shards(shards).iter_batches(batch_size=4096, batch_format="pyarrow")
    ).sort_by("url")
    rows = sorted(ROWS)
    assert got["url"].to_pylist() == [r[0] for r in rows]
    assert got["warc_epoch"].to_pylist() == [r[1] for r in rows]
    assert got["html"].to_pylist() == [r[2] for r in rows]


def test_member_splitting_is_per_record(ray_session):
    shards = pa.concat_tables(
        write_warc_shards(_pages(ROWS), shard_size=50).iter_batches(
            batch_size=64, batch_format="pyarrow"
        )
    ).sort_by("shard_id")
    assert shards["shard_id"].to_pylist() == [0, 1]
    assert shards["n_records"].to_pylist() == [3, 1]
    members = _split_members(shards["payload"][0].as_py())
    assert len(members) == 3  # one gzip member per record
    # every member is itself a complete well-formed record
    assert {_parse_record(m)[0] for m in members} == {
        "doc://0",
        "doc://1",
        "doc://7",
    }


def test_record_format_and_date_parse():
    rec = _record("doc://9", 1704067209, b"<x/>")
    assert rec.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert b"WARC-Date: 2024-01-01T00:00:09Z\r\n" in rec
    assert b"WARC-Target-URI: doc://9\r\n" in rec
    url, epoch, html = _parse_record(rec)
    assert (url, epoch, html) == ("doc://9", 1704067209, b"<x/>")


def test_blob_determinism(ray_session):
    def blob():
        t = pa.concat_tables(
            write_warc_shards(_pages(ROWS), shard_size=50).iter_batches(
                batch_size=64, batch_format="pyarrow"
            )
        ).sort_by("shard_id")
        return t["payload"].to_pylist()

    assert blob() == blob()


def test_payload_length_guard():
    rec = bytearray(_record("doc://3", 1704067203, b"abcdef"))
    # corrupt the html payload length: truncate one byte off the end
    import pytest

    with pytest.raises(ValueError):
        _parse_record(bytes(rec[:-5]))  # strips part of the html + CRLFs


def test_wet_conversion_roundtrip(ray_session):
    from lamapi_ray.sources.warc import read_wet_shards, write_wet_shards

    rows = [
        ("doc://0", 1704067200, "zero text body"),
        ("doc://1", 1704067201, "unicode café κείμενο"),
        ("doc://52", 1704067252, ""),
    ]
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(2)
    got = pa.concat_tables(
        read_wet_shards(write_wet_shards(pages, shard_size=50)).iter_batches(
            batch_size=64, batch_format="pyarrow"
        )
    ).sort_by("url")
    srt = sorted(rows)
    assert got["url"].to_pylist() == [r[0] for r in srt]
    assert got["warc_epoch"].to_pylist() == [r[1] for r in srt]
    assert got["text"].to_pylist() == [r[2] for r in srt]


def test_wet_reader_rejects_response_records(ray_session):
    import gzip as _gzip

    import pytest

    from lamapi_ray.sources.warc import _record, read_wet_shards

    blob = _gzip.compress(_record("doc://9", 1704067209, b"<x/>"), 6, mtime=0)
    shards = ray.data.from_arrow(
        pa.table(
            {
                "shard_id": pa.array([0], pa.int64()),
                "payload": pa.array([blob], pa.binary()),
            }
        )
    )
    with pytest.raises(Exception):
        pa.concat_tables(
            read_wet_shards(shards).iter_batches(batch_size=4, batch_format="pyarrow")
        )
