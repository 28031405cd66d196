"""PII scrub kernel (stages/pii.py)."""

import pyarrow as pa
import ray.data

from lamapi_ray.stages.pii import pii_scrub, scrub_batch


def test_scrub_batch_counts_and_redaction():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "mail a.b+c@ex-ample.co.uk or d@e.io now",
                    "host 192.168.0.1 and 10.0.0.255 call 555-0042",
                    "clean text with no pii at all",
                ],
                pa.string(),
            ),
        }
    )
    out = scrub_batch(t).to_pydict()
    assert out["n_emails"] == [2, 0, 0]
    assert out["n_ipv4"] == [0, 2, 0]
    assert out["n_phones"] == [0, 1, 0]
    assert out["scrubbed"] == [
        "mail <EMAIL> or <EMAIL> now",
        "host <IP> and <IP> call <PHONE>",
        "clean text with no pii at all",
    ]


def test_pii_scrub_streams_dataset():
    ds = ray.data.from_items(
        [{"doc_id": i, "text": f"u{i}@x.io"} for i in range(10)]
    )
    out = pa.concat_tables(
        pii_scrub(ds).iter_batches(batch_format="pyarrow", batch_size=1024)
    ).sort_by("doc_id")
    assert out["n_emails"].to_pylist() == [1] * 10
    assert set(out["scrubbed"].to_pylist()) == {"<EMAIL>"}
