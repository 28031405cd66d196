"""CCNet perplexity bucketing (stages/lmscore.py::perplexity_buckets)."""

import numpy as np
import pyarrow as pa
import ray.data

from lamapi_ray.stages.lmscore import perplexity_buckets


def test_split_matches_scalar_rankk(ray_session):
    # common tokens make low-surprisal docs; rare tokens high
    texts = (
        ["common common common common"] * 4
        + ["common common rare%d x%d" % (i, i) for i in range(4)]
        + ["only%d unique%d tokens%d here%d" % (i, i, i, i) for i in range(4)]
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    t = pa.concat_tables(
        perplexity_buckets(ds).iter_batches(batch_size=256, batch_format="pyarrow")
    ).sort_by("doc_id")
    avg = t["avg_micro"].to_numpy(zero_copy_only=False)
    buckets = t["bucket"].to_pylist()
    # scalar reference: exact rank-k thresholds, ties land low
    srt = np.sort(avg)
    n = len(srt)
    t1 = srt[-(-n // 3) - 1]
    t2 = srt[-(-(2 * n) // 3) - 1]
    want = [
        "head" if a <= t1 else ("middle" if a <= t2 else "tail") for a in avg
    ]
    assert buckets == want
    # the uniform common docs are head; the all-unique docs are tail
    assert all(b == "head" for b in buckets[:4])
    assert all(b == "tail" for b in buckets[-4:])
