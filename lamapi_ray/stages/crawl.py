"""Crawl politeness scheduling — per-host fetch-time assignment under a
minimum inter-request delay (the frontier scheduler every polite crawler
runs; RFC 9309's Crawl-delay is the de-facto contract).

The recurrence ``t_k = max(arr_k, t_{k-1} + d)`` (first fetch at
arrival, later fetches no closer than ``d`` apart) looks sequential,
but in max-plus algebra it closes exactly:

    t_k = d·k + max_{j ≤ k} (arr_j − d·j)

so the whole per-host schedule is ONE vectorized running max
(``np.maximum.accumulate``) over arrivals sorted by (arr, id) — no
per-request Python, and the same closed form is what the DuckDB oracle
states as a window ``max`` (the engine and the oracle share the
identity, not the loop).

Dataflow: ``groupby(host).map_groups`` co-locates each host's requests
(hosts are the natural partition key of a crawl frontier — millions of
independent groups at real scale, so the shuffle is well-spread; a
single giant host is inherently sequential by the politeness contract
itself, not by this implementation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def schedule_fetches(
    requests: ray.data.Dataset,
    delay: int = 2,
    host_col: str = "host",
    arr_col: str = "arr",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(id, host, arr) → same + ``fetch_ts``: earliest fetch times
    respecting arrival order and a per-host minimum ``delay`` between
    consecutive fetches. Ties on arrival break by id (deterministic)."""

    def schedule_group(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = group[arr_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, arr))
        k = np.arange(len(ids), dtype=np.int64)
        base = np.maximum.accumulate(arr[order] - delay * k)
        fetch = delay * k + base
        out = np.empty(len(ids), dtype=np.int64)
        out[order] = fetch
        return group.append_column("fetch_ts", pa.array(out, pa.int64()))

    return requests.groupby(host_col).map_groups(
        schedule_group, batch_format="pyarrow"
    )
