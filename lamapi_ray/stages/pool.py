"""Actor-pool sizing helper.

A fixed ``concurrency=N`` pool reserves N CPUs for the job's lifetime; on a
cluster with <= N CPUs the upstream read operator starves and the pipeline
deadlocks (observed at ``num_cpus=2``). A plain ``(1, N)`` autoscaling pool
is deadlock-free but starts at one actor and pays a ramp-up on big nodes.
``pool_width`` gives both: the min is the requested width capped at
(cluster CPUs - 1), so the producer always has a slot and big nodes start
at full width.
"""

from __future__ import annotations

import ray


def pool_width(concurrency: int) -> tuple[int, int]:
    """→ (min, max) actor-pool bounds for ``map_batches(Cls, ...)``."""
    cpus = None
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU")
    if not cpus:
        return (1, concurrency)
    return (min(concurrency, max(1, int(cpus) - 1)), concurrency)
