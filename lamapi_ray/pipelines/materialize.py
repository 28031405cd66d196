"""Graph materialization — hash-partitioned, sorted, deduped, resumable.

SURVEY §7 step 8: the final KG sink. Triples are hash-partitioned by
``subj`` (crc32 bucket — deterministic, no PYTHONHASHSEED), each partition
sorted by (subj, pred, obj) and exactly deduped, written as partitioned
Parquet with a per-partition lineage+metrics manifest
(:mod:`lamapi_ray.state.checkpoint`). A rerun after a crash skips complete
partitions (their manifest is the commit record) and recomputes only the
rest.

Scale shape: the bucket tag + groupby is ONE all-to-all (the same exchange
any hash-partitioned write needs); per-bucket sort/dedup/write runs inside
the workers against their local bucket. On a multi-node cluster the output
root must be shared storage (the same assumption ``write_parquet`` makes).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.state import checkpoint


def materialize_triples(
    triples: ray.data.Dataset | pa.Table,
    root: str,
    num_buckets: int = 16,
    resume: bool = True,
) -> dict:
    """Write triples to ``root`` as ``part=<bucket>/data.parquet`` + manifest.

    Returns ``{"computed": [...], "skipped": [...], "rows": N}``.
    """
    os.makedirs(root, exist_ok=True)
    done = set(checkpoint.completed_partitions(root)) if resume else set()
    all_parts = [str(b) for b in range(num_buckets)]
    todo = [p for p in all_parts if p not in done]

    if todo:
        ds = (
            ray.data.from_arrow(triples)
            if isinstance(triples, pa.Table)
            else triples
        )
        todo_arr = np.asarray(sorted(int(p) for p in todo), dtype=np.int64)

        def tag(batch: pa.Table) -> pa.Table:
            # pure-arrow bucket tag: vectorized string hash, no pandas trip
            from lamapi_ray.functions.inthash import hash_string_array

            subj = batch["subj"]
            if isinstance(subj, pa.ChunkedArray):
                subj = subj.combine_chunks()
            bucket = (hash_string_array(subj) % np.uint64(num_buckets)).astype(
                np.int64
            )
            out = batch.append_column("__bucket", pa.array(bucket, pa.int64()))
            return out.filter(pa.array(np.isin(bucket, todo_arr)))

        def write_bucket(group: pa.Table) -> pa.Table:
            if len(group) == 0:
                return pa.table(
                    {"bucket": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())}
                )
            bucket = int(group["__bucket"][0].as_py())
            cols = [c for c in group.column_names if c != "__bucket"]
            tbl = group.select(cols).combine_chunks()
            tbl = tbl.sort_by([(c, "ascending") for c in cols])
            if len(tbl) > 1:
                # exact dedup over sorted rows: adjacent-difference mask
                # (no pandas drop_duplicates round trip)
                diff = np.zeros(len(tbl) - 1, dtype=bool)
                for c in cols:
                    arr = tbl[c]
                    if isinstance(arr, pa.ChunkedArray):
                        arr = arr.combine_chunks()
                    ne = pc.fill_null(
                        pc.not_equal(arr.slice(1), arr.slice(0, len(tbl) - 1)),
                        True,
                    )
                    diff |= ne.to_numpy(zero_copy_only=False)
                keep = np.concatenate([[True], diff])
                tbl = tbl.filter(pa.array(keep))
            manifest = checkpoint.write_partition(
                root,
                str(bucket),
                tbl,
                lineage={"stage": "materialize_triples", "bucket": bucket,
                         "num_buckets": num_buckets},
                metrics={"input_rows": len(group), "deduped_rows": len(tbl)},
            )
            return pa.table(
                {"bucket": pa.array([bucket], pa.int64()),
                 "rows": pa.array([manifest["rows"]], pa.int64())}
            )

        summary_ds = (
            ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket", num_partitions=num_buckets)
            .map_groups(write_bucket, batch_format="pyarrow")
        )
        written = set()
        for b in summary_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            written.update(int(x) for x in b["bucket"].to_pylist())
        # buckets with zero input rows still need an (empty) commit record
        schema = pa.schema(
            [(c, pa.string()) for c in ("subj", "pred", "obj")]
        )
        for p in todo:
            if int(p) not in written:
                checkpoint.write_partition(
                    root,
                    p,
                    schema.empty_table(),
                    lineage={"stage": "materialize_triples", "bucket": int(p),
                             "num_buckets": num_buckets},
                    metrics={"input_rows": 0, "deduped_rows": 0},
                )

    rows = 0
    for p in all_parts:
        with open(
            os.path.join(checkpoint.partition_dir(root, p), checkpoint.MANIFEST)
        ) as f:
            rows += json.load(f)["rows"]
    with open(os.path.join(root, checkpoint.SUCCESS), "w") as f:
        json.dump(
            {"partitions": num_buckets, "partition_ids": all_parts, "rows": rows},
            f,
        )
    return {
        "computed": todo,
        "skipped": [p for p in all_parts if p not in todo],
        "rows": rows,
    }


def materialize_sorted_range(
    triples: ray.data.Dataset | pa.Table,
    root: str,
    num_partitions: int = 8,
    resume: bool = True,
) -> dict:
    """RANGE-partitioned sorted export: the ordered-table sink.

    Two passes: (1) exact per-key counts of ``subj`` (the key domain is
    entity-vocabulary-bounded, so the partial-count exchange is tiny)
    yield nearest-rank cut points splitting the row mass into
    ``num_partitions`` contiguous key ranges; (2) one range-tag map + ONE
    grouped exchange; each partition sorts/dedupes its range locally and
    commits with a manifest recording its [lo, hi] key range. Reading the
    partitions in id order yields a GLOBALLY sorted table — the property
    hash bucketing cannot give — so downstream range scans and merge joins
    can binary-search the manifest instead of reading everything.

    At 10^12-row scale pass 1 becomes a sample-based splitter (the classic
    TeraSort design) — the dataflow is unchanged; exact counts keep this
    small-scale build deterministic and oracle-checkable.
    """
    from ray.data.aggregate import Sum

    os.makedirs(root, exist_ok=True)
    done = set(checkpoint.completed_partitions(root)) if resume else set()
    all_parts = [str(b) for b in range(num_partitions)]
    todo = [p for p in all_parts if p not in done]

    ds = (
        ray.data.from_arrow(triples) if isinstance(triples, pa.Table) else triples
    )

    if todo:
        def key_counts(batch: pa.Table) -> pa.Table:
            subj = batch["subj"]
            if isinstance(subj, pa.ChunkedArray):
                subj = subj.combine_chunks()
            vals, cnts = np.unique(
                np.asarray(subj.to_pylist(), dtype=object), return_counts=True
            )
            return pa.table(
                {"subj": pa.array(list(vals), pa.string()),
                 "c": pa.array(cnts.astype(np.int64), pa.int64())}
            )

        agg = (
            ds.map_batches(key_counts, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("subj")
            .aggregate(Sum("c"))
        )
        parts_tbl = pa.concat_tables(
            agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        keys = np.asarray(parts_tbl["subj"].to_pylist(), dtype=object)
        cnts = parts_tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        keys, cnts = keys[order], cnts[order]
        cum = np.cumsum(cnts)
        total = int(cum[-1]) if len(cum) else 0
        # cut k = FIRST key whose cumulative count reaches rank k·total/P —
        # partition p owns keys in (cut_{p-1}, cut_p]
        cuts = []
        for i in range(1, num_partitions):
            rank = int(np.ceil(total * i / num_partitions))
            j = int(np.searchsorted(cum, rank))
            cuts.append(keys[min(j, len(keys) - 1)] if len(keys) else "")
        cuts_arr = np.asarray(cuts, dtype=object)
        todo_arr = np.asarray(sorted(int(p) for p in todo), dtype=np.int64)

        def tag(batch: pa.Table) -> pa.Table:
            subj = batch["subj"]
            if isinstance(subj, pa.ChunkedArray):
                subj = subj.combine_chunks()
            sv = np.asarray(subj.to_pylist(), dtype=object)
            part = np.searchsorted(cuts_arr, sv, side="left").astype(np.int64)
            out = batch.append_column("__part", pa.array(part, pa.int64()))
            return out.filter(pa.array(np.isin(part, todo_arr)))

        def write_part(group: pa.Table) -> pa.Table:
            if len(group) == 0:
                return pa.table(
                    {"part": pa.array([], pa.int64()),
                     "rows": pa.array([], pa.int64())}
                )
            part = int(group["__part"][0].as_py())
            cols = [c for c in group.column_names if c != "__part"]
            tbl = group.select(cols).combine_chunks()
            tbl = tbl.sort_by([(c, "ascending") for c in cols])
            if len(tbl) > 1:
                diff = np.zeros(len(tbl) - 1, dtype=bool)
                for c in cols:
                    arr = tbl[c]
                    if isinstance(arr, pa.ChunkedArray):
                        arr = arr.combine_chunks()
                    ne = pc.fill_null(
                        pc.not_equal(arr.slice(1), arr.slice(0, len(tbl) - 1)),
                        True,
                    )
                    diff |= ne.to_numpy(zero_copy_only=False)
                tbl = tbl.filter(pa.array(np.concatenate([[True], diff])))
            lo = tbl["subj"][0].as_py() if len(tbl) else None
            hi = tbl["subj"][len(tbl) - 1].as_py() if len(tbl) else None
            manifest = checkpoint.write_partition(
                root, str(part), tbl,
                lineage={"stage": "materialize_sorted_range", "part": part,
                         "num_partitions": num_partitions,
                         "range_lo": lo, "range_hi": hi},
                metrics={"input_rows": len(group), "deduped_rows": len(tbl)},
            )
            return pa.table(
                {"part": pa.array([part], pa.int64()),
                 "rows": pa.array([manifest["rows"]], pa.int64())}
            )

        summary_ds = (
            ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__part", num_partitions=num_partitions)
            .map_groups(write_part, batch_format="pyarrow")
        )
        written = set()
        for b in summary_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            written.update(int(x) for x in b["part"].to_pylist())
        schema = pa.schema([(c, pa.string()) for c in ("subj", "pred", "obj")])
        for p in todo:
            if int(p) not in written:
                checkpoint.write_partition(
                    root, p, schema.empty_table(),
                    lineage={"stage": "materialize_sorted_range", "part": int(p),
                             "num_partitions": num_partitions,
                             "range_lo": None, "range_hi": None},
                    metrics={"input_rows": 0, "deduped_rows": 0},
                )

    rows = 0
    for p in all_parts:
        with open(
            os.path.join(checkpoint.partition_dir(root, p), checkpoint.MANIFEST)
        ) as f:
            rows += json.load(f)["rows"]
    with open(os.path.join(root, checkpoint.SUCCESS), "w") as f:
        json.dump(
            {"partitions": num_partitions, "partition_ids": all_parts,
             "rows": rows},
            f,
        )
    return {
        "computed": todo,
        "skipped": [p for p in all_parts if p not in todo],
        "rows": rows,
    }
