"""Sitemap source roundtrip (sources/sitemap.py)."""

import pyarrow as pa
import ray.data

from lamapi_ray.sources.sitemap import read_sitemaps, write_sitemaps

ROWS = [
    ("h0.example.com", "doc://0", 1704067200),
    ("h0.example.com", "doc://17", 1704067217),
    ("h1.example.com", "doc://1", 1704067201),
]


def _urls():
    return ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([r[0] for r in ROWS], pa.string()),
                "url": pa.array([r[1] for r in ROWS], pa.string()),
                "epoch": pa.array([r[2] for r in ROWS], pa.int64()),
            }
        )
    ).repartition(2)


def test_roundtrip(ray_session):
    out = pa.concat_tables(
        read_sitemaps(write_sitemaps(_urls())).iter_batches(
            batch_size=64, batch_format="pyarrow"
        )
    ).sort_by("url")
    assert out["host"].to_pylist() == [
        "h0.example.com",
        "h1.example.com",
        "h0.example.com",
    ]
    assert out["url"].to_pylist() == ["doc://0", "doc://1", "doc://17"]
    assert out["lastmod"].to_pylist() == [
        "2024-01-01T00:00:00Z",
        "2024-01-01T00:00:01Z",
        "2024-01-01T00:00:17Z",
    ]


def test_blob_shape_and_determinism(ray_session):
    def blobs():
        t = pa.concat_tables(
            write_sitemaps(_urls()).iter_batches(batch_size=64, batch_format="pyarrow")
        ).sort_by("host")
        return t["sitemap"].to_pylist()

    a = blobs()
    assert a == blobs()
    assert a[0].startswith('<?xml version="1.0"')
    assert a[0].count("<url>") == 2 and a[1].count("<url>") == 1
    assert "<loc>doc://0</loc>" in a[0]
    assert a[0].endswith("</urlset>")
