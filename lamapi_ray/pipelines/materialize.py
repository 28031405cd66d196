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

import pandas as pd
import pyarrow as pa
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
        todo_set = {int(p) for p in todo}

        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            from lamapi_ray.functions.inthash import hash_string_array

            batch = batch.copy()
            batch["__bucket"] = (
                hash_string_array(pa.array(batch["subj"], pa.string()))
                % num_buckets
            ).astype("int64")
            return batch[batch["__bucket"].isin(todo_set)]

        def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
            bucket = int(group["__bucket"].iloc[0])
            cols = [c for c in group.columns if c != "__bucket"]
            out = (
                group[cols]
                .drop_duplicates()
                .sort_values(cols, kind="mergesort")
                .reset_index(drop=True)
            )
            manifest = checkpoint.write_partition(
                root,
                str(bucket),
                pa.Table.from_pandas(out, preserve_index=False),
                lineage={"stage": "materialize_triples", "bucket": bucket,
                         "num_buckets": num_buckets},
                metrics={"input_rows": len(group), "deduped_rows": len(out)},
            )
            return pd.DataFrame({"bucket": [bucket], "rows": [manifest["rows"]]})

        summary = (
            ds.map_batches(tag, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(write_bucket, batch_format="pandas")
            .to_pandas()
        )
        written = {int(b) for b in summary["bucket"]} if len(summary) else set()
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
