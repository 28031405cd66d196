"""Crawl politeness scheduler (stages/crawl.py) and anchor-text
extraction (stages/linkgraph.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.crawl import schedule_fetches
from lamapi_ray.stages.linkgraph import anchor_surface_forms, extract_anchor_texts


def _ref_schedule(rows, delay):
    """Scalar recurrence t_k = max(arr_k, t_prev + delay) per host."""
    from collections import defaultdict

    by_host = defaultdict(list)
    for i, h, a in rows:
        by_host[h].append((a, i))
    out = {}
    for h, lst in by_host.items():
        prev = None
        for a, i in sorted(lst):
            t = a if prev is None else max(a, prev + delay)
            out[i] = t
            prev = t
    return out


def _run_schedule(rows, delay):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "host": pa.array([r[1] for r in rows], pa.int64()),
                "arr": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(3)
    t = pa.concat_tables(
        schedule_fetches(ds, delay=delay).iter_batches(
            batch_size=4096, batch_format="pyarrow"
        )
    )
    return dict(zip(t["doc_id"].to_pylist(), t["fetch_ts"].to_pylist()))


def test_schedule_matches_scalar_recurrence(ray_session):
    rows = [
        (1, 0, 100),  # burst on host 0
        (2, 0, 100),
        (3, 0, 101),
        (4, 0, 200),  # idle gap: fetch at arrival again
        (5, 1, 100),  # other host independent
    ]
    got = _run_schedule(rows, delay=2)
    assert got == _ref_schedule(rows, 2)
    assert got[1] == 100 and got[2] == 102 and got[3] == 104
    assert got[4] == 200 and got[5] == 100


def test_schedule_random_matches_recurrence(ray_session):
    rng = np.random.default_rng(23)
    rows = [
        (i, int(rng.integers(0, 5)), int(rng.integers(0, 50)))
        for i in range(300)
    ]
    for d in (1, 3):
        assert _run_schedule(rows, d) == _ref_schedule(rows, d)


def test_anchor_extraction_and_counts(ray_session):
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["doc://1", "doc://2"], pa.string()),
                "html": pa.array(
                    [
                        b'<html><body><p>x <a href="doc://9">red plate</a>'
                        b' y <a href="doc://8">blue cup</a> z</p></body></html>',
                        b'<html><body><p><a href="doc://9">red plate</a>'
                        b"</p></body></html>",
                    ],
                    pa.binary(),
                ),
            }
        )
    ).repartition(2)
    edges = pa.concat_tables(
        extract_anchor_texts(pages).iter_batches(batch_size=64, batch_format="pyarrow")
    )
    got = sorted(zip(edges["dst"].to_pylist(), edges["anchor"].to_pylist()))
    assert got == [
        ("doc://8", "blue cup"),
        ("doc://9", "red plate"),
        ("doc://9", "red plate"),
    ]
    counts = pa.concat_tables(
        anchor_surface_forms(extract_anchor_texts(pages)).iter_batches(
            batch_size=64, batch_format="pyarrow"
        )
    ).sort_by("dst")
    assert counts["dst"].to_pylist() == ["doc://8", "doc://9"]
    assert counts["anchor"].to_pylist() == ["blue cup", "red plate"]
    assert counts["n"].to_pylist() == [1, 2]


def test_anchor_prior_sums_to_one_per_anchor(ray_session):
    """Per-anchor priors sum to 1 (within printf rounding) and each
    (anchor, dst) prior equals n / anchor_total exactly."""
    from collections import defaultdict

    from lamapi_ray.pipelines.extras import anchor_prior

    out = anchor_prior("/root/testdata/sf0.001")
    assert out.num_rows > 0
    by_anchor = defaultdict(float)
    for r in out.to_pylist():
        assert r["n"] >= 1
        assert r["anchor_total"] >= r["n"]
        assert abs(r["prior"] - round(r["n"] / r["anchor_total"], 6)) < 1e-12
        by_anchor[r["anchor"]] += r["prior"]
    for a, s in by_anchor.items():
        assert abs(s - 1.0) < 1e-4, (a, s)
