"""Charset detection cascade (stages/charset.py)."""

import pyarrow as pa
import ray.data

from lamapi_ray.stages.charset import (
    attach_encoded_payload,
    decode_payloads,
    detect_charset,
)


def test_bom_wins_over_content():
    # UTF-8 BOM then plain ascii
    assert detect_charset(b"\xef\xbb\xbfhi") == ("utf-8-bom", "hi")
    assert detect_charset(b"\xff\xfeh\x00i\x00") == ("utf-16-le", "hi")
    assert detect_charset(b"\xfe\xff\x00h\x00i") == ("utf-16-be", "hi")


def test_strict_utf8_then_latin1_fallback():
    assert detect_charset("café".encode("utf-8")) == ("utf-8", "café")
    # 0xE9 is é in Latin-1 but an invalid UTF-8 trailing byte
    assert detect_charset("café".encode("latin-1")) == ("latin-1", "café")
    # every byte decodes in Latin-1, so the cascade always terminates
    assert detect_charset(bytes(range(256)))[0] == "latin-1"


def test_ascii_is_utf8():
    assert detect_charset(b"plain ascii") == ("utf-8", "plain ascii")


def test_stage_roundtrip_normalizes_all_classes(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(8)), pa.int64()),
                "text": pa.array([f"doc {i} body" for i in range(8)], pa.string()),
            }
        )
    ).repartition(2)
    out = pa.concat_tables(
        decode_payloads(attach_encoded_payload(docs)).iter_batches(
            batch_size=64, batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    want_labels = ["utf-8", "utf-8-bom", "latin-1", "utf-16-le"] * 2
    assert out["charset"].to_pylist() == want_labels
    assert out["text"].to_pylist() == [f"doc {i} body café" for i in range(8)]
