"""Predicate-usage summaries — the reference's ``scripts/summary.py`` rebuilt.

A1: unwind the adjacency → group by predicate → count → normalized stats
    (summary.py:88-103 objects pipeline).
A2: same over the literal table grouped by (datatype, predicate)
    (summary.py:110-131).
A3: distribution stats (mean / sample-stdev / min / max / sum over the
    per-predicate counts) then per-row normalized counts rounded to 2 dp
    (summary.py:33-38,43-62) — a two-pass pattern: global aggregate, then a
    broadcast normalize.
J4: predicate label join against items, 'Unknown Label' default
    (summary.py:19-22,67).

The groupby runs distributed (the count is the only all-to-all); the stats
and label join run on the driver because the grouped result is
predicate-cardinality-bounded (tiny by construction).
"""

from __future__ import annotations

import statistics

from lamapi_ray.functions.text import round_ref

import pyarrow as pa
import ray.data


def _normalize(counts: list[int]) -> list[dict]:
    mean = statistics.mean(counts)
    stdev = statistics.stdev(counts)  # sample stdev, like statistics.stdev
    cmax = max(counts)
    cmin = min(counts)
    csum = sum(counts)
    return [
        {
            "countNormSumAll": round_ref(c / csum, 2),
            "countNormMax": round_ref(c / cmax, 2),
            "countNormMinMax": round_ref((c - cmin) / (cmax - cmin), 2),
            "countNormZScore": round_ref((c - mean) / stdev, 2),
        }
        for c in counts
    ]


def predicate_summary(
    triples: ray.data.Dataset | pa.Table,
    labels: dict[str, str],
    extra_keys: list[str] | None = None,
) -> pa.Table:
    """adjacency triples → per-predicate summary table.

    ``extra_keys`` adds grouping columns (e.g. ``["datatype"]`` for the
    literals variant).
    """
    keys = (extra_keys or []) + ["pred"]
    if isinstance(triples, pa.Table):
        triples = ray.data.from_arrow(triples)
    grouped = triples.groupby(keys).count().to_pandas()
    grouped = grouped.rename(columns={"count()": "count"})
    counts = [int(c) for c in grouped["count"]]
    norms = _normalize(counts)
    out: dict[str, list] = {k: grouped[k].tolist() for k in (extra_keys or [])}
    out["predicate"] = grouped["pred"].tolist()
    out["label"] = [labels.get(p, "Unknown Label") for p in out["predicate"]]
    out["count"] = counts
    for field in ("countNormSumAll", "countNormMax", "countNormMinMax", "countNormZScore"):
        out[field] = [n[field] for n in norms]
    fields = [(k, pa.string()) for k in (extra_keys or [])]
    fields += [
        ("predicate", pa.string()),
        ("label", pa.string()),
        ("count", pa.int64()),
        ("countNormSumAll", pa.float64()),
        ("countNormMax", pa.float64()),
        ("countNormMinMax", pa.float64()),
        ("countNormZScore", pa.float64()),
    ]
    return pa.table({k: pa.array(out[k], t) for k, t in fields})


def summary_topk(
    summary: pa.Table, k: int = 10, rank_order: str = "desc"
) -> pa.Table:
    """Top-k summary rows by ``count`` — O3 parity with the reference's
    ``summary_retriever.py:17-21`` / ``api/server.py:689-699``, which take
    ``rank_order`` ∈ {"asc", "desc"} (Mongo sort on ``count``) and a row
    limit ``k``. Tie-break: predicate ascending (deterministic stand-in for
    Mongo's unspecified tie order — documented deviation)."""
    if rank_order not in ("asc", "desc"):
        raise ValueError(f"rank_order must be 'asc' or 'desc', got {rank_order!r}")
    import pyarrow.compute as pc

    order = pc.sort_indices(
        summary,
        sort_keys=[
            ("count", "ascending" if rank_order == "asc" else "descending"),
            ("predicate", "ascending"),
        ],
    )
    return summary.take(order[:k])
