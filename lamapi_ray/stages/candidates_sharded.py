"""Sharded surface-index candidate generation — the beyond-broadcast path.

The broadcast path (stages/candidates.py) ships ONE surface-form table to
every worker — right while the index is vocabulary-bounded. At Wikidata
scale (~10^8 surface rows, SURVEY §4) the index outgrows a broadcast; this
module shards it by ``hash(token)``:

* each surface row is replicated to the shard of every DISTINCT token of
  its ``surface_norm`` (duplication factor ≈ mean ntoken, 2-3) — but only
  once per distinct shard, so per-shard posting lists stay exact;
* a shard OWNS exactly the tokens hashing to it, and partial shared-token
  counts computed against owned tokens sum across shards to precisely the
  broadcast path's ``|tokens(e) ∩ M|`` (token ownership is a partition);
* the scoring kernel is the SAME :func:`~lamapi_ray.index.surface.
  score_hit_rows` the broadcast path uses, so the two paths produce
  identical candidate tables (asserted in tests/test_sharded_index.py).

Dataflow (all exchanges mention-vocabulary-bounded, never page-bounded):

    distinct mentions → explode (shard, mention) per owning shard
    → groupby(shard) → per-shard partial hit rows (metadata + partial
    shared) → groupby(mention) → merge partials by (id, surface_norm),
    score, per-mention argmax → candidate rows.

Shard sub-tables are built once (vocabulary-bounded) and ``ray.put``
individually; a worker materializes only the shards routed to it, cached
per process. At full Wikidata scale the shard build becomes a Ray job
writing shard parquet — the query-side dataflow is unchanged by that swap.

Fuzzy retrieval shards by the SymSpell symmetric-delete neighborhood:
a surface row is replicated to every shard owning a ≤2-delete variant of
one of its tokens, and a query token visits every shard owning a variant
within its AUTO edit budget — if ``lev(q, v) ≤ k`` the two share a common
≤k-delete variant, so the pair meets in ≥1 shard (exhaustive routing).
Because one mention token can match two vocabulary tokens owned by
DIFFERENT shards, fuzzy partials carry per-mention-token bitmasks
(:meth:`SurfaceIndex._hit_masks`) and the merge ORs + popcounts instead of
summing — identical shared counts to the broadcast path (asserted in
tests/test_sharded_index.py).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
from lamapi_ray.stages.dedup import scaled_partitions
import ray
import ray.data

from lamapi_ray.index.surface import SurfaceIndex, score_hit_rows_arrays
from lamapi_ray.stages.candidates import CANDIDATE_FIELDS


def token_shard(token: str, num_shards: int) -> int:
    return zlib.crc32(token.encode("utf-8")) % num_shards


def build_shard_tables(
    surface_forms: pa.Table, num_shards: int
) -> list[pa.Table]:
    """Replicate each surface row to every shard owning ≥1 of its tokens.

    Each shard carries a ``_grow`` column = the physical row index in the
    original table, so the merge stage can sum partial shared counts per
    surface ROW — (id, surface_norm) is NOT unique (clean_str can collapse
    two distinct surfaces of one entity to the same norm)."""
    norms = surface_forms["surface_norm"].to_pylist()
    tagged = surface_forms.append_column(
        "_grow", pa.array(np.arange(len(surface_forms)), pa.int64())
    )
    shard_rows: list[list[int]] = [[] for _ in range(num_shards)]
    for i, norm in enumerate(norms):
        for s in {token_shard(t, num_shards) for t in set(norm.split(" "))}:
            shard_rows[s].append(i)
    return [tagged.take(pa.array(rows, pa.int64())) for rows in shard_rows]


def delete_variants(token: str, k: int) -> set[str]:
    """All strings reachable by deleting ≤k characters (includes the token
    itself) — the SymSpell symmetric-delete neighborhood. If
    ``lev(a, b) ≤ k`` then a and b share a common ≤k-delete variant, which
    is the routing guarantee for sharded fuzzy retrieval."""
    out = {token}
    frontier = {token}
    for _ in range(k):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


_MAX_FUZZ = 2  # max AUTO edit budget (SurfaceIndex.auto_fuzz)


def fuzzy_token_shards(token: str, budget: int, num_shards: int) -> set[int]:
    """Shards a fuzzy query token must visit: every shard owning a
    ≤budget-delete variant of it."""
    return {token_shard(d, num_shards) for d in delete_variants(token, budget)}


def build_fuzzy_shard_tables(
    surface_forms: pa.Table, num_shards: int
) -> list[pa.Table]:
    """Replicate each surface row to every shard owning a ≤_MAX_FUZZ-delete
    variant of ≥1 of its tokens. Replication factor is bounded by
    min(#variants, num_shards) per token — the price of fuzzy matching
    without a broadcast index; with the symmetric-delete property this
    routing is exhaustive: any (query token, vocab token) pair within the
    AUTO edit budget meets in at least one shard."""
    norms = surface_forms["surface_norm"].to_pylist()
    tagged = surface_forms.append_column(
        "_grow", pa.array(np.arange(len(surface_forms)), pa.int64())
    )
    shard_rows: list[list[int]] = [[] for _ in range(num_shards)]
    for i, norm in enumerate(norms):
        shards: set[int] = set()
        for t in set(norm.split(" ")):
            shards.update(
                token_shard(d, num_shards) for d in delete_variants(t, _MAX_FUZZ)
            )
            if len(shards) == num_shards:
                break
        for s in shards:
            shard_rows[s].append(i)
    return [tagged.take(pa.array(rows, pa.int64())) for rows in shard_rows]


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(arr: np.ndarray) -> np.ndarray:
    return _POPCOUNT8[arr.view(np.uint8).reshape(len(arr), 8)].sum(axis=1)


_SHARD_CACHE: list = [None, None]  # (key, {shard_id: SurfaceIndex})


def _shard_index(refs_key: str, shard_refs, type_names_ref, s: int) -> SurfaceIndex:
    if _SHARD_CACHE[0] != refs_key:
        _SHARD_CACHE[0] = refs_key
        _SHARD_CACHE[1] = {}
    cache = _SHARD_CACHE[1]
    if s not in cache:
        cache[s] = SurfaceIndex(ray.get(shard_refs[s]), ray.get(type_names_ref))
    return cache[s]


_PARTIAL_FIELDS = [
    ("mention", pa.string()),
    ("id", pa.string()),
    ("name", pa.string()),
    ("norm", pa.string()),
    ("description", pa.string()),
    ("kind", pa.string()),
    ("nertype", pa.string()),
    ("types_str", pa.string()),
    ("type_names", pa.string()),
    ("ntoken", pa.int64()),
    ("length", pa.int64()),
    ("popularity", pa.float64()),
    ("shared", pa.int64()),
    ("grow", pa.int64()),
]


def generate_candidates_sharded(
    distinct_mentions: ray.data.Dataset,
    surface_forms: pa.Table,
    type_names: dict[str, str],
    limit: int = 1000,
    num_shards: int = 8,
    retrieve_kwargs: dict | None = None,
) -> ray.data.Dataset:
    """distinct mentions (col ``mention``) → scored candidate rows, via the
    hash(token)-sharded index. Output is identical to
    :func:`~lamapi_ray.stages.candidates.generate_candidates`."""
    rk = dict(retrieve_kwargs or {})
    fuzzy = bool(rk.pop("fuzzy", False))
    # fuzzy shards route by the symmetric-delete neighborhood (a query
    # token must reach every shard owning a vocab token within its AUTO
    # edit budget); partial hits then carry per-mention-token BITMASKS so
    # the merge ORs instead of sums — one token matching two vocab tokens
    # owned by different shards must count once
    shard_tables = (
        build_fuzzy_shard_tables(surface_forms, num_shards)
        if fuzzy
        else build_shard_tables(surface_forms, num_shards)
    )
    shard_refs = [ray.put(t) for t in shard_tables]
    type_names_ref = ray.put(type_names)
    refs_key = "".join(
        r.hex() if hasattr(r, "hex") else str(id(r)) for r in shard_refs[:1]
    )

    def route(batch: pa.Table) -> pa.Table:
        from lamapi_ray.index.surface import SurfaceIndex

        out_s, out_m = [], []
        for m in batch["mention"].to_pylist():
            if fuzzy:
                shards: set[int] = set()
                for t in set(m.split(" ")):
                    shards |= fuzzy_token_shards(
                        t, SurfaceIndex.auto_fuzz(t), num_shards
                    )
            else:
                shards = {token_shard(t, num_shards) for t in set(m.split(" "))}
            for s in sorted(shards):
                out_s.append(s)
                out_m.append(m)
        return pa.table(
            {
                "shard": pa.array(out_s, pa.int32()),
                "mention": pa.array(out_m, pa.string()),
            }
        )

    routed = distinct_mentions.map_batches(route, batch_format="pyarrow")

    def partial_hits(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({n: pa.array([], t) for n, t in _PARTIAL_FIELDS})
        s = int(group["shard"][0].as_py())
        index = _shard_index(refs_key, shard_refs, type_names_ref, s)
        cols: dict[str, list] = {n: [] for n, _ in _PARTIAL_FIELDS}
        for m in group["mention"].to_pylist():
            if fuzzy:
                # full local matching; the shared slot carries the token
                # BITMASK (OR-mergeable across shards, no double counting)
                idx, shared = index._hit_masks(m, fuzzy=True, **rk)
            else:
                own = {t for t in set(m.split(" ")) if token_shard(t, num_shards) == s}
                idx, shared = index._hit_set(m, own_tokens=own, **rk)
            if len(idx) == 0:
                continue
            rows = index.hit_rows(idx, shared)
            cols["mention"].extend([m] * len(idx))
            for key, src in (
                ("id", "id"), ("name", "name"), ("norm", "norm"),
                ("description", "description"), ("kind", "kind"),
                ("nertype", "nertype"), ("types_str", "types_str"),
                ("type_names", "type_names"), ("ntoken", "ntoken"),
                ("length", "length"), ("popularity", "popularity"),
                ("shared", "shared"), ("grow", "grow"),
            ):
                cols[key].extend(rows[src].tolist())
        return pa.table(
            {n: pa.array(cols[n], t) for n, t in _PARTIAL_FIELDS}
        )

    partials = routed.groupby("shard", num_partitions=num_shards).map_groups(
        partial_hits, batch_format="pyarrow"
    )

    def score_group(group: pa.Table) -> pa.Table:
        out: dict[str, list] = {n: [] for n, _ in CANDIDATE_FIELDS}
        if len(group) == 0:
            return pa.table(
                {n: pa.array(out[n], t) for n, t in CANDIDATE_FIELDS}
            )
        mention = group["mention"][0].as_py()
        arrs = {
            n: np.asarray(group[n].to_pylist(), dtype=object)
            for n in ("id", "name", "norm", "description", "kind",
                      "nertype", "types_str", "type_names")
        }
        arrs["ntoken"] = np.asarray(group["ntoken"].to_pylist(), dtype=np.int64)
        arrs["length"] = np.asarray(group["length"].to_pylist(), dtype=np.int64)
        arrs["popularity"] = np.asarray(group["popularity"].to_pylist(), dtype=np.float64)
        shared = np.asarray(group["shared"].to_pylist(), dtype=np.int64)
        # merge partials on the PHYSICAL surface-row id carried through the
        # shards — (id, norm) is not unique when clean_str collapses two
        # distinct surfaces of one entity to the same norm
        key = np.asarray(group["grow"].to_pylist(), dtype=np.int64)
        uniq, first_idx, inv = np.unique(key, return_index=True, return_inverse=True)
        merged_shared = np.zeros(len(uniq), dtype=np.int64)
        if fuzzy:
            np.bitwise_or.at(merged_shared, inv, shared)
            merged_shared = _popcount64(merged_shared)
        else:
            np.add.at(merged_shared, inv, shared)
        rows = {k: v[first_idx] for k, v in arrs.items()}
        rows["shared"] = merged_shared
        cols = score_hit_rows_arrays(mention, rows, limit, fuzzy=fuzzy)
        if cols is None:
            return pa.table(
                {n: pa.array(out[n], t) for n, t in CANDIDATE_FIELDS}
            )
        # per-mention argmax — same rule as CandidateGenerator.__call__,
        # vectorized over the candidate arrays
        n_c = len(cols["id"])
        total = cols["ed_score"] + cols["jaccard_score"] + cols["jaccardNgram_score"]
        best = np.lexsort((cols["id"], -cols["popularity"], -total))[0]
        is_best = np.zeros(n_c, dtype=bool)
        is_best[best] = True
        data = {"mention": np.full(n_c, mention, dtype=object), "is_best": is_best}
        data.update(cols)
        return pa.table({n: pa.array(data[n], t) for n, t in CANDIDATE_FIELDS})

    return partials.groupby("mention", num_partitions=scaled_partitions(0.5, 16)).map_groups(
        score_group, batch_format="pyarrow"
    )
