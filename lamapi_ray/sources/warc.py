"""WARC source — Common Crawl's native archive format, end to end.

Crawl corpora ship as ``.warc.gz`` shards: a stream of WARC/1.0
``response`` records, each record an independently-gzipped member so
readers can fan out and random-access (the ISO 28500 / Common Crawl
convention). This models that with stdlib ``gzip``/``zlib`` only:

* **writer**: pages grouped into shards (deterministic range buckets on
  the url's doc id — no skew), each record serialized as a spec-shaped
  WARC record (``WARC-Type: response``, ``WARC-Target-URI``,
  ``WARC-Date`` at second granularity, ``Content-Length`` over an
  ``HTTP/1.1 200`` block carrying the html payload), gzipped as its OWN
  member (``mtime=0`` → byte-deterministic blobs), members concatenated
  into one blob per shard;
* **reader**: a row-expanding ``map_batches`` over shard blobs — a
  ``zlib.decompressobj`` loop splits the blob back into members via
  ``unused_data`` (the real random-access property), then each record is
  parsed by its headers: ``Content-Length`` slices the HTTP block, the
  HTTP header/body split recovers the html BYTES EXACTLY, and
  ``WARC-Date`` is parsed back to epoch seconds. Parsing is per record
  inside one shard (a source is I/O-shaped: inherently sequential within
  a blob, parallel across blobs — the same contract as
  ``sources/gzipshards.py``).

Roundtrip invariant (oracle-checked as ``warc_roundtrip``): url, epoch
timestamp, and html bytes survive write→read byte-identically — the
per-url byte-identity contract the north rule pins for extracted text,
pushed down to the archive layer.

Reference anchor: lamAPI ingests pre-extracted dumps (scripts/
parse_wikidata_dump.py); the WARC layer is the web-corpus ingestion
surface the Ray engine adds for Common-Crawl-style inputs.
"""

from __future__ import annotations

import calendar
import gzip
import hashlib
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_CRLF = b"\r\n"


def _warc_date(epoch: int) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(epoch))


def _record(url: str, epoch: int, html: bytes) -> bytes:
    """One WARC/1.0 response record (uncompressed)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    rid = hashlib.md5(url.encode("utf-8")).hexdigest()
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n"
        b"WARC-Date: " + _warc_date(epoch).encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    return headers + http + _CRLF + _CRLF


def write_warc_shards(
    pages: ray.data.Dataset, shard_size: int = 50, level: int = 6
) -> ray.data.Dataset:
    """pages (url, warc_ts, html) → (shard_id, payload .warc.gz bytes,
    n_records). One gzip member per record, concatenated per shard."""

    def with_shard(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        did = pc.cast(
            pc.replace_substring(url.cast(pa.string()), "doc://", ""), pa.int64()
        )
        epoch = pc.divide(
            pc.cast(batch["warc_ts"].cast(pa.timestamp("us")), pa.int64()),
            1_000_000,
        ).cast(pa.int64())
        return pa.table(
            {
                "shard_id": pc.divide(did, shard_size).cast(pa.int64()),
                "url": url,
                "epoch": epoch,
                "html": batch["html"],
            }
        )

    def pack(group: pa.Table) -> pa.Table:
        urls = group["url"].to_pylist()
        order = np.argsort(np.asarray(urls, dtype=object), kind="stable")
        epochs = group["epoch"].to_numpy(zero_copy_only=False)
        htmls = group["html"].to_pylist()
        members = [
            gzip.compress(
                _record(urls[k], int(epochs[k]), htmls[k]), level, mtime=0
            )
            for k in order
        ]
        return pa.table(
            {
                "shard_id": pa.array([group["shard_id"][0].as_py()], pa.int64()),
                "payload": pa.array([b"".join(members)], pa.binary()),
                "n_records": pa.array([len(members)], pa.int64()),
            }
        )

    return (
        pages.map_batches(with_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard_id")
        .map_groups(pack, batch_format="pyarrow")
    )


def _wet_record(url: str, epoch: int, text: str) -> bytes:
    """One WARC/1.0 ``conversion`` record (the WET convention: extracted
    text as a plain ``text/plain`` payload, no HTTP block)."""
    payload = text.encode("utf-8")
    rid = hashlib.md5(("wet:" + url).encode("utf-8")).hexdigest()
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n"
        b"WARC-Date: " + _warc_date(epoch).encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return headers + payload + _CRLF + _CRLF


def write_wet_shards(
    pages: ray.data.Dataset, shard_size: int = 50, level: int = 6
) -> ray.data.Dataset:
    """pages (url, warc_ts, text) → (shard_id, payload .wet.gz bytes,
    n_records): Common Crawl's WET sidecar — extracted text as
    ``conversion`` records, one gzip member per record."""

    def with_shard(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        did = pc.cast(
            pc.replace_substring(url.cast(pa.string()), "doc://", ""), pa.int64()
        )
        epoch = pc.divide(
            pc.cast(batch["warc_ts"].cast(pa.timestamp("us")), pa.int64()),
            1_000_000,
        ).cast(pa.int64())
        return pa.table(
            {
                "shard_id": pc.divide(did, shard_size).cast(pa.int64()),
                "url": url,
                "epoch": epoch,
                "text": batch["text"],
            }
        )

    def pack(group: pa.Table) -> pa.Table:
        urls = group["url"].to_pylist()
        order = np.argsort(np.asarray(urls, dtype=object), kind="stable")
        epochs = group["epoch"].to_numpy(zero_copy_only=False)
        texts = group["text"].to_pylist()
        members = [
            gzip.compress(
                _wet_record(urls[k], int(epochs[k]), texts[k]), level, mtime=0
            )
            for k in order
        ]
        return pa.table(
            {
                "shard_id": pa.array([group["shard_id"][0].as_py()], pa.int64()),
                "payload": pa.array([b"".join(members)], pa.binary()),
                "n_records": pa.array([len(members)], pa.int64()),
            }
        )

    return (
        pages.map_batches(with_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard_id")
        .map_groups(pack, batch_format="pyarrow")
    )


def read_wet_shards(shards: ray.data.Dataset) -> ray.data.Dataset:
    """(shard_id, payload) → (url, warc_epoch, text) — conversion
    records have a bare payload (no HTTP block to unwrap)."""

    def unpack(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        epochs: list[int] = []
        texts: list[str] = []
        for payload in batch["payload"].to_pylist():
            for rec in _split_members(payload):
                head, _, body = rec.partition(b"\r\n\r\n")
                hdr: dict[bytes, bytes] = {}
                for line in head.split(_CRLF)[1:]:
                    k, _, v = line.partition(b": ")
                    hdr[k] = v
                if hdr.get(b"WARC-Type") != b"conversion":
                    raise ValueError("not a WET conversion record")
                clen = int(hdr[b"Content-Length"])
                urls.append(hdr[b"WARC-Target-URI"].decode("utf-8"))
                epochs.append(
                    calendar.timegm(
                        time.strptime(
                            hdr[b"WARC-Date"].decode(), "%Y-%m-%dT%H:%M:%SZ"
                        )
                    )
                )
                texts.append(body[:clen].decode("utf-8"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_epoch": pa.array(epochs, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return shards.map_batches(
        unpack, batch_format="pyarrow", zero_copy_batch=True, batch_size=16
    )


def _split_members(blob: bytes) -> list[bytes]:
    """Decompress a concatenated-member gzip stream into one bytes chunk
    per member (the CC random-access property)."""
    out = []
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=47)  # 32 + 15: gzip header detect
        out.append(d.decompress(rest))
        rest = d.unused_data
    return out


def _parse_record(rec: bytes) -> tuple[str, int, bytes]:
    head, _, body = rec.partition(b"\r\n\r\n")
    hdr: dict[bytes, bytes] = {}
    for line in head.split(_CRLF)[1:]:  # [0] is the WARC/1.0 version line
        k, _, v = line.partition(b": ")
        hdr[k] = v
    clen = int(hdr[b"Content-Length"])
    http = body[:clen]
    http_head, _, html = http.partition(b"\r\n\r\n")
    want = int(
        dict(
            l.partition(b": ")[::2] for l in http_head.split(_CRLF)[1:]
        )[b"Content-Length"]
    )
    if len(html) != want:
        raise ValueError("HTTP payload length mismatch in WARC record")
    epoch = calendar.timegm(
        time.strptime(hdr[b"WARC-Date"].decode(), "%Y-%m-%dT%H:%M:%SZ")
    )
    return hdr[b"WARC-Target-URI"].decode("utf-8"), epoch, html


def read_warc_shards(shards: ray.data.Dataset) -> ray.data.Dataset:
    """(shard_id, payload) → pages rows (url, warc_epoch, html)."""

    def unpack(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        epochs: list[int] = []
        htmls: list[bytes] = []
        for payload in batch["payload"].to_pylist():
            for rec in _split_members(payload):
                u, e, h = _parse_record(rec)
                urls.append(u)
                epochs.append(e)
                htmls.append(h)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_epoch": pa.array(epochs, pa.int64()),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return shards.map_batches(
        unpack, batch_format="pyarrow", zero_copy_batch=True, batch_size=16
    )
