"""Column classification — the M13/ST2 stage as a real actor pool.

The reference (api/model/data_retrievers/column_analysis.py) transposes
request tables to columns and runs an external ``ColumnClassifier(model_
type)`` over them — loading the model PER REQUEST (:27, an inefficiency
SURVEY §2.3/ST2 calls out). Here the model is a callable CLASS passed to
``map_batches(..., concurrency=N)``: state (the compiled literal-regex
chain, the NE/LIT tag table, per-worker memo caches) is built once per
actor in ``__init__``; ``__call__`` emits per-batch partial
(column, datatype) counts — the map-side combine — and a single small
``groupby().sum()`` + majority vote finishes the job (the pre-aggregation
pattern: the shuffle sees column×datatype rows, never cell counts).

No learned weights ship with the reference repo and no model artifacts
exist in this container, so the "model" is the deterministic literal
taxonomy (M9/M10) — the actor plumbing, state lifecycle and dataflow are
the real thing and swapping in learned weights is local to ``__init__``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from lamapi_ray.functions.literals import XML_DATATYPES, check_literal
from lamapi_ray.stages.pool import pool_width


class ColumnClassifierModel:
    """Per-actor model state: classifier + memo cache, built once."""

    def __init__(self, model_type: str = "rules-v1"):
        if model_type != "rules-v1":
            raise NotImplementedError(
                "learned column-classifier weights are not present in this "
                "environment; plug the model load in here (once per actor)"
            )
        self.model_type = model_type
        self._memo: dict[str, str] = {}

    def _classify(self, value: str) -> str:
        dt = self._memo.get(value)
        if dt is None:
            dt = check_literal(value)
            if len(self._memo) < 1_000_000:
                self._memo[value] = dt
        return dt

    def __call__(self, batch: pa.Table) -> pa.Table:
        """(column, value) rows → per-batch partial (column, datatype, n)."""
        cols_out, dts_out, ns_out = [], [], []
        col_arr = batch["column"].to_pylist()
        val_arr = batch["value"].to_pylist()
        # batch-distinct combine: classify each distinct value once
        pairs: dict[tuple[str, str], int] = {}
        for c, v in zip(col_arr, val_arr):
            dt = self._classify(v)
            key = (c, dt)
            pairs[key] = pairs.get(key, 0) + 1
        for (c, dt), n in sorted(pairs.items()):
            cols_out.append(c)
            dts_out.append(dt)
            ns_out.append(n)
        return pa.table(
            {
                "column": pa.array(cols_out, pa.string()),
                "datatype": pa.array(dts_out, pa.string()),
                "n": pa.array(ns_out, pa.int64()),
            }
        )


def classify_columns(
    values: ray.data.Dataset,
    concurrency: int = 2,
    batch_size: int = 4096,
    model_type: str = "rules-v1",
) -> pa.Table:
    """(column, value) Dataset → per-column majority verdict table
    (column, datatype, classification, tag, n_values) — reference
    column_analysis.py:57-72 tag mapping, majority per column."""
    from ray.data.aggregate import Sum

    agg = (
        values.map_batches(
            ColumnClassifierModel,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_constructor_kwargs={"model_type": model_type},
            concurrency=pool_width(concurrency),
            batch_size=batch_size,
        )
        .groupby(["column", "datatype"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for col, grp in agg.groupby("column"):
        grp = grp.sort_values(["n", "datatype"], ascending=[False, True])
        best = grp.iloc[0]
        rec = XML_DATATYPES[best["datatype"]]
        rows.append(
            {
                "column": col,
                "datatype": best["datatype"],
                "classification": rec["classification"],
                "tag": rec["tag"],
                "n_values": int(grp["n"].sum()),
            }
        )
    rows.sort(key=lambda r: r["column"])
    return pa.table(
        {
            "column": pa.array([r["column"] for r in rows], pa.string()),
            "datatype": pa.array([r["datatype"] for r in rows], pa.string()),
            "classification": pa.array(
                [r["classification"] for r in rows], pa.string()
            ),
            "tag": pa.array([r["tag"] for r in rows], pa.string()),
            "n_values": pa.array([r["n_values"] for r in rows], pa.int64()),
        }
    )
