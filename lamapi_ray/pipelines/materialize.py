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
