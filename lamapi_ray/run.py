"""End-to-end KG-construction job: pages → triples → checkpointed output.

``run_job`` is the operational entry point (the analogue of running the
reference's ingest + index + summary scripts back to back): it executes the
flagship pipeline, materializes the graph into hash-partitioned Parquet with
per-partition lineage + per-stage metrics (mentions/sec, candidate fan-out,
link-score latency — the north-star observability set), writes the summary
side-tables, and is resumable: partitions already committed under the output
root are skipped on rerun.

CLI::

    python -m lamapi_ray.run --sf-dir /root/testdata/sf0.001 --out /tmp/kg_out

Owns a Ray session ONLY when none exists (the driver/test harness owns it
otherwise).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def run_job(
    sf_dir: str,
    out_root: str,
    replicate: int = 1,
    limit: int = 1000,
    num_buckets: int = 16,
    resume: bool = True,
) -> dict:
    import ray

    from lamapi_ray import synth
    from lamapi_ray.pipelines.kg import KGContext, run_pipeline
    from lamapi_ray.pipelines.materialize import materialize_triples
    from lamapi_ray.pipelines.summary import predicate_summary

    t_start = time.time()
    stage_sec: dict[str, float] = {}

    t0 = time.time()
    kg = synth.build_kg_tables(sf_dir)
    ctx = KGContext(kg["items"], kg["triples"])
    stage_sec["index_build"] = round(time.time() - t0, 3)

    t0 = time.time()
    pages = synth.pages_dataset(sf_dir, replicate=replicate)
    res = run_pipeline(pages, ctx, limit=limit)
    triples_tbl = pa.concat_tables(
        b
        for b in res["triples"].iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    stage_sec["pipeline"] = round(time.time() - t0, 3)

    # stage metrics (counts come from the already-collected small outputs)
    mentions_tbl = pa.concat_tables(
        b
        for b in res["mentions"].iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    cands_tbl = pa.concat_tables(
        b
        for b in res["candidates"].iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    )
    n_mentions = mentions_tbl.num_rows
    n_distinct = len(pa.compute.unique(mentions_tbl["mention"]))
    metrics = {
        "mentions": n_mentions,
        "distinct_mentions": n_distinct,
        "mentions_per_sec": round(n_mentions / max(stage_sec["pipeline"], 1e-9), 1),
        "candidate_fan_out": round(cands_tbl.num_rows / max(n_distinct, 1), 2),
        "link_score_latency_sec_per_mention": round(
            stage_sec["pipeline"] / max(n_mentions, 1), 6
        ),
        "triples": triples_tbl.num_rows,
    }
    lineage = {
        "input": sf_dir,
        "replicate": replicate,
        "limit": limit,
        "stage_sec": stage_sec,
        "stage_metrics": metrics,
    }

    t0 = time.time()
    mat = materialize_triples(
        triples_tbl, os.path.join(out_root, "adjacency"), num_buckets, resume
    )
    # enrich each partition manifest written THIS run with job-level metrics
    from lamapi_ray.state import checkpoint

    for p in mat["computed"]:
        mpath = os.path.join(
            checkpoint.partition_dir(os.path.join(out_root, "adjacency"), p),
            checkpoint.MANIFEST,
        )
        with open(mpath) as f:
            m = json.load(f)
        m["lineage"].update(lineage)
        with open(mpath, "w") as f:
            json.dump(m, f, sort_keys=True)
    stage_sec["materialize"] = round(time.time() - t0, 3)

    labels = dict(
        zip(kg["items"]["entity"].to_pylist(), kg["items"]["label"].to_pylist())
    )
    import ray.data

    summary = predicate_summary(kg["triples"], labels)
    pq.write_table(summary, os.path.join(out_root, "summary_objects.parquet"))

    out = {
        "wall_sec": round(time.time() - t_start, 3),
        "stage_sec": stage_sec,
        "metrics": metrics,
        "materialize": mat,
        "out_root": out_root,
    }
    with open(os.path.join(out_root, "job_report.json"), "w") as f:
        json.dump(out, f, sort_keys=True, indent=1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--limit", type=int, default=1000)
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    os.makedirs(args.out, exist_ok=True)
    report = run_job(
        args.sf_dir,
        args.out,
        replicate=args.replicate,
        limit=args.limit,
        num_buckets=args.num_buckets,
        resume=not args.no_resume,
    )
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
