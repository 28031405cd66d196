"""Distributed graph analytics over KG edge lists.

The KG construction pipeline ends in an edge list (``subj``, ``pred``,
``obj`` — pipelines/kg.py, pipelines/materialize.py); these operators are
the analysis passes a KG consumer runs next. The reference stops at lookup
serving (its summary endpoint counts predicates only — scripts/summary.py),
so these are engine-first operators in the Pregel/GraphX dataflow mold,
expressed as Ray Data exchanges:

* :func:`degrees` — per-entity out/in degree. Per-batch combiner (one
  dictionary-encode + ``np.bincount`` per batch) emits partial counts, ONE
  vocabulary-bounded ``groupby.sum`` merges them — occurrences never cross
  the wire individually.
* :func:`pagerank` — fixed-iteration PageRank in INTEGER fixed-point
  (rank × 10^9 as int64): contribution = ``rank_fp // out_deg``, update =
  ``base + (85 · Σcontrib) // 100``. All-integer arithmetic makes the
  result bit-reproducible across engines (no float-sum ordering hazard),
  which is what lets the DuckDB oracle check it exactly. Each iteration is
  two grouped exchanges (the Pregel pattern): scatter shares along edges
  grouped by source, gather sums grouped by destination. Edge rows carry
  only (key, dst); rank state is node-sized. Dangling nodes (out_deg = 0)
  keep the base term and emit nothing — the standard simplified variant
  (no dangling-mass redistribution); total mass therefore decays, which is
  fine for ranking use.
* :func:`ancestor_closure` — transitive closure of a parent forest by
  PARALLEL POINTER JUMPING: batch-local pre-closure, then ⌈log2 of the
  residual depth⌉ rounds of ONE grouped exchange each, with every new
  ancestor pair emitted exactly once (no global distinct, no quadratic-
  multiplicity R∘R composition — see the function docstring).

Iterative state (ranks, closure relation) is ``materialize()``d once per
round — deliberate: it is node-/closure-sized (≪ corpus), and without it
each round's lineage would recompute every prior round. Edges are
materialized once for the same reason.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.functions.inthash import hash_string_array
from lamapi_ray.stages.dedup import scaled_partitions
PR_SCALE = 10**9  # fixed-point scale: rank 1.0 == 10^9
PR_NUM, PR_DEN = 85, 100  # damping d = 0.85 as an integer ratio


def _dict_codes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, pa.Array]:
    """→ (int64 codes, dictionary values) for a string column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return np.asarray(enc.indices, dtype=np.int64), enc.dictionary


def degrees(
    edges: ray.data.Dataset, src: str = "subj", dst: str = "obj"
) -> ray.data.Dataset:
    """→ Dataset (entity, out_deg, in_deg), one row per node of ``edges``.

    Map-side combine (one dictionary-encode + bincount per batch), then ONE
    exchange grouped by an int64 bucket of the entity hash — grouping on the
    int bucket instead of the string key keeps the shuffle sort radix-cheap
    (measured ~2× on a 3M-edge list); the per-bucket merge is a second
    dictionary-encode + ``np.add.at``."""
    width = scaled_partitions(1.0, 8)

    def partial(batch: pa.Table) -> pa.Table:
        s_codes, s_vals = _dict_codes(batch[src])
        d_codes, d_vals = _dict_codes(batch[dst])
        out_c = np.bincount(s_codes, minlength=len(s_vals)).astype(np.int64)
        in_c = np.bincount(d_codes, minlength=len(d_vals)).astype(np.int64)
        ent = pa.concat_arrays([s_vals.cast(pa.string()), d_vals.cast(pa.string())])
        return pa.table(
            {
                "entity": ent,
                "out_p": pa.array(
                    np.concatenate([out_c, np.zeros(len(d_vals), np.int64)])
                ),
                "in_p": pa.array(
                    np.concatenate([np.zeros(len(s_vals), np.int64), in_c])
                ),
                "__bucket": _bucket_col(ent, width),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        codes, vals = _dict_codes(group["entity"])
        out_s = np.zeros(len(vals), np.int64)
        in_s = np.zeros(len(vals), np.int64)
        np.add.at(out_s, codes, group["out_p"].to_numpy(zero_copy_only=False))
        np.add.at(in_s, codes, group["in_p"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "entity": vals.cast(pa.string()),
                "out_deg": pa.array(out_s),
                "in_deg": pa.array(in_s),
            }
        )

    return (
        edges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=width)
        .map_groups(merge, batch_format="pyarrow")
    )


def _bucket_col(col, width: int) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash_string_array(col.cast(pa.string()))
    return pa.array((h % np.uint64(width)).astype(np.int64))


def _pagerank_broadcast(
    edges: ray.data.Dataset,
    deg: ray.data.Dataset,
    iters: int,
    width: int,
    init_fp: int,
    base_fp: int,
    src: str,
    dst: str,
    seed_fn=None,
):
    """Broadcast-rank PageRank iterations; None if the node-hash lookup
    table has a collision (caller falls back to the shuffle path).

    ``seed_fn``, if given, personalizes the teleport: it receives the
    node entity array (hash-sorted order) and returns the per-node
    ``(init_fp, base_fp)`` int64 vectors, replacing the uniform scalars —
    the only difference between PageRank and personalized PageRank."""
    import ray as _ray

    deg_tbl = pa.concat_tables(
        deg.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    ent = deg_tbl["entity"].combine_chunks().cast(pa.string())
    eh = hash_string_array(ent)
    order = np.argsort(eh, kind="stable")
    eh_sorted = eh[order]
    if len(eh_sorted) > 1 and (eh_sorted[1:] == eh_sorted[:-1]).any():
        return None
    od_sorted = (
        deg_tbl["out_deg"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    )
    if seed_fn is not None:
        init_fp, base_fp = seed_fn(ent.take(pa.array(order)))
        rf = np.asarray(init_fp, np.int64).copy()
    else:
        rf = np.full(len(eh_sorted), init_fp, np.int64)
    eh_ref = _ray.put(eh_sorted)

    def gather_sum(group: pa.Table) -> pa.Table:
        codes, vals = _dict_codes(group["entity"])
        sums = np.zeros(len(vals), np.int64)
        np.add.at(
            sums, codes, group["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"entity": vals.cast(pa.string()), "s": pa.array(sums)})

    for _ in range(iters):
        shares = np.where(od_sorted > 0, rf // np.maximum(od_sorted, 1), 0)
        sh_ref = _ray.put(shares)

        def scatter(batch: pa.Table, _sh=sh_ref) -> pa.Table:
            keys = _ray.get(eh_ref)
            sh = _ray.get(_sh)
            s_col = batch[src]
            if isinstance(s_col, pa.ChunkedArray):
                s_col = s_col.combine_chunks()
            h = hash_string_array(s_col.cast(pa.string()))
            pos = np.searchsorted(keys, h)  # every src IS a node, exact hit
            contrib = sh[pos]
            d_codes, d_vals = _dict_codes(batch[dst])
            sums = np.zeros(len(d_vals), np.int64)
            np.add.at(sums, d_codes, contrib)
            return pa.table(
                {
                    "entity": d_vals.cast(pa.string()),
                    "s": pa.array(sums),
                    "__bucket": _bucket_col(d_vals, width),
                }
            )

        contribs = (
            edges.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket", num_partitions=width)
            .map_groups(gather_sum, batch_format="pyarrow")
        )
        c_tbl = pa.concat_tables(
            contribs.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        s_arr = np.zeros(len(eh_sorted), np.int64)
        if len(c_tbl):
            ch = hash_string_array(c_tbl["entity"].combine_chunks().cast(pa.string()))
            cs = c_tbl["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            s_arr[np.searchsorted(eh_sorted, ch)] = cs
        rf = base_fp + (PR_NUM * s_arr) // PR_DEN

    # un-sort back to deg_tbl's row order, emit final columns
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    rf_out = rf[inv]
    return ray.data.from_arrow(
        pa.table(
            {
                "entity": ent,
                "rank_fp": pa.array(rf_out),
                "rank": pa.array(rf_out / float(PR_SCALE)),
            }
        )
    )


def pagerank(
    edges: ray.data.Dataset,
    iters: int = 3,
    src: str = "subj",
    dst: str = "obj",
    mode: str = "auto",
    broadcast_max: int = 50_000_000,
) -> ray.data.Dataset:
    """Fixed-point PageRank → Dataset (entity, rank_fp, rank).

    ``rank_fp`` is the int64 fixed-point rank (scale 10^9); ``rank`` is the
    exact double ``rank_fp / 10^9`` (identical bits on any IEEE engine).

    Two execution paths, identical output (asserted equal in tests):

    * ``broadcast`` — rank state is NODE-sized (≈1000× smaller than the
      edge list), so like the label index (ST3) it is ``ray.put`` once per
      iteration and each iteration is ONE edge map (no edge re-shuffle) +
      one bucket-grouped gather of combined contributions. Node lookup is
      by 2^61 string hash, verified COLLISION-FREE at build time (falls
      back to the shuffle path on a collision, so exactness never rests on
      a probabilistic argument).
    * ``shuffle`` — the Pregel-style two-exchange iteration for node sets
      too large to broadcast (> ``broadcast_max``): scatter shares along
      edges grouped by source, gather sums grouped by destination.

    ``auto`` picks broadcast iff the node count fits ``broadcast_max``.
    """
    width = scaled_partitions(1.0, 8)
    edges = edges.materialize()
    if edges.num_blocks() < width:
        # a single-block input (e.g. from_arrow of a driver table) would
        # serialize every map stage; real inputs arrive as many parquet
        # blocks and skip this
        edges = edges.repartition(width).materialize()
    # materialized once: deg is read twice (count + seed) and its lineage
    # (a full groupby over the edges) must not re-execute
    deg = degrees(edges, src, dst).repartition(width).materialize()
    n_nodes = deg.count()
    init_fp = PR_SCALE // n_nodes
    base_fp = ((PR_DEN - PR_NUM) * PR_SCALE) // (PR_DEN * n_nodes)

    if mode == "auto":
        mode = "broadcast" if n_nodes <= broadcast_max else "shuffle"
    if mode == "broadcast":
        out = _pagerank_broadcast(
            edges, deg, iters, width, init_fp, base_fp, src, dst
        )
        if out is not None:
            return out
        # hash collision in the node set (≈n²/2^61 odds) — shuffle path is
        # collision-free by construction

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": batch["entity"],
                "out_deg": batch["out_deg"],
                "rf": pa.array(np.full(len(batch), init_fp, np.int64)),
            }
        )

    # coalesce rank state to `width` blocks per round: map_groups emits many
    # tiny blocks, and per-block overhead would dominate the node-sized state
    ranks = (
        deg.map_batches(seed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(width)
        .materialize()
    )

    def tag_edge(batch: pa.Table) -> pa.Table:
        n = len(batch)
        key = batch[src]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        return pa.table(
            {
                "key": key.cast(pa.string()),
                "dst": batch[dst].cast(pa.string()),
                "rf": pa.nulls(n, pa.int64()),
                "out_deg": pa.nulls(n, pa.int64()),
                "__bucket": _bucket_col(key, width),
            }
        )

    def tag_rank(batch: pa.Table) -> pa.Table:
        n = len(batch)
        key = batch["entity"]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        return pa.table(
            {
                "key": key.cast(pa.string()),
                "dst": pa.nulls(n, pa.string()),
                "rf": batch["rf"].cast(pa.int64()),
                "out_deg": batch["out_deg"].cast(pa.int64()),
                "__bucket": _bucket_col(key, width),
            }
        )

    def scatter(group: pa.Table) -> pa.Table:
        # split sides by dst-null: rank rows have dst NULL
        is_rank = pc.is_null(group["dst"]).combine_chunks()
        rk = group.filter(is_rank)
        eg = group.filter(pc.invert(is_rank))
        if len(eg) == 0 or len(rk) == 0:
            return pa.table(
                {"entity": pa.array([], pa.string()), "s": pa.array([], pa.int64())}
            )
        key_all = pa.concat_arrays(
            [
                rk["key"].combine_chunks().cast(pa.string()),
                eg["key"].combine_chunks().cast(pa.string()),
            ]
        )
        codes, _vals = _dict_codes(key_all)
        nr = len(rk)
        rf = rk["rf"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = rk["out_deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        share_by_code = np.zeros(len(_vals), np.int64)
        share_by_code[codes[:nr]] = np.where(od > 0, rf // np.maximum(od, 1), 0)
        contrib = share_by_code[codes[nr:]]
        # partial-aggregate inside the bucket by destination before the
        # gather shuffle — one row per distinct dst per bucket
        d_codes, d_vals = _dict_codes(eg["dst"])
        sums = np.zeros(len(d_vals), np.int64)
        np.add.at(sums, d_codes, contrib)
        return pa.table(
            {"entity": d_vals.cast(pa.string()), "s": pa.array(sums)}
        )

    def tag_contrib(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ent = batch["entity"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        return pa.table(
            {
                "entity": ent.cast(pa.string()),
                "s": batch["s"].cast(pa.int64()),
                "out_deg": pa.nulls(n, pa.int64()),
                "__bucket": _bucket_col(ent, width),
            }
        )

    def tag_base(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ent = batch["entity"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        return pa.table(
            {
                "entity": ent.cast(pa.string()),
                "s": pa.array(np.zeros(n, np.int64)),
                "out_deg": batch["out_deg"].cast(pa.int64()),
                "__bucket": _bucket_col(ent, width),
            }
        )

    def gather(group: pa.Table) -> pa.Table:
        codes, vals = _dict_codes(group["entity"])
        s = group["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.zeros(len(vals), np.int64)
        np.add.at(sums, codes, s)
        od_col = group["out_deg"].to_numpy(zero_copy_only=False)
        od = np.full(len(vals), -1, np.int64)
        base_mask = ~pa.compute.is_null(group["out_deg"]).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        np.maximum.at(od, codes[base_mask], od_col[base_mask].astype(np.int64))
        rf = base_fp + (PR_NUM * sums) // PR_DEN
        return pa.table(
            {
                "entity": vals.cast(pa.string()),
                "out_deg": pa.array(od),
                "rf": pa.array(rf),
            }
        )

    edge_tagged = edges.map_batches(
        tag_edge, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    for _ in range(iters):
        rank_tagged = ranks.map_batches(
            tag_rank, batch_format="pyarrow", zero_copy_batch=True
        )
        contribs = (
            edge_tagged.union(rank_tagged)
            .groupby("__bucket", num_partitions=width)
            .map_groups(scatter, batch_format="pyarrow")
        )
        both = contribs.map_batches(
            tag_contrib, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            ranks.map_batches(tag_base, batch_format="pyarrow", zero_copy_batch=True)
        )
        ranks = (
            both.groupby("__bucket", num_partitions=width)
            .map_groups(gather, batch_format="pyarrow")
            .repartition(width)
            .materialize()
        )

    def finish(batch: pa.Table) -> pa.Table:
        rf = batch["rf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "entity": batch["entity"],
                "rank_fp": pa.array(rf),
                "rank": pa.array(rf / float(PR_SCALE)),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _pair_distinct(ds: ray.data.Dataset, width: int) -> ray.data.Dataset:
    """Distinct (entity, anc) string pairs via one bucket-grouped exchange."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        ent = batch["entity"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        anc = batch["anc"]
        if isinstance(anc, pa.ChunkedArray):
            anc = anc.combine_chunks()
        joined = pc.binary_join_element_wise(
            ent.cast(pa.string()), anc.cast(pa.string()), "\x1f"
        )
        return pa.table(
            {
                "entity": ent.cast(pa.string()),
                "anc": anc.cast(pa.string()),
                "__bucket": _bucket_col(joined, width),
            }
        )

    def distinct(group: pa.Table) -> pa.Table:
        return group.select(["entity", "anc"]).group_by(["entity", "anc"]).aggregate([])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=width)
        .map_groups(distinct, batch_format="pyarrow")
    )


def ancestor_closure(
    parents: ray.data.Dataset, max_rounds: int = 32, width: int | None = None
) -> ray.data.Dataset:
    """Transitive closure of a parent FOREST (entity → anc, ≤1 parent per
    entity) by parallel pointer jumping.

    Three-phase PRAM-style dataflow:

    1. **Batch-local pre-closure** — follow parent pointers as far as they
       resolve within each batch (vectorized, one jump per loop turn);
       chains that fit a block close here for free. Emits the local
       ancestor pairs AND each entity's current TOP pointer (its farthest
       known ancestor).
    2. **Jump rounds** — per round ONE grouped exchange co-locates, for
       every key k: the entities whose top is k, k's known ancestor list,
       and k's own top. New pairs = (those entities) × (k's ancestors) —
       emitted EXACTLY ONCE each (the naive R∘R doubling re-derives every
       chain pair once per split point, so it needs a distinct pass and a
       quadratic-multiplicity confirm round; this formulation needs
       neither). Tops jump to top(top(x)). Rounds = ⌈log2 of the residual
       cross-block depth⌉, then one cheap empty round confirms the
       fixpoint (every top is a root ⇒ no ancestor lists ⇒ zero output).
    3. R accumulates by plain union — no global distinct ever runs.

    Default exchange width is NARROW (0.25 per cpu): the closure relation
    is hierarchy-sized (type ontologies are vocabulary-class, ≪ corpus),
    so per-round all-to-all latency — not data volume — dominates; wide
    shuffles only add task overhead. Callers closing a genuinely large
    relation pass an explicit ``width``."""
    width = width or scaled_partitions(0.25, 8)

    def local_close(batch: pa.Table) -> pa.Table:
        # kind 'p' rows: (entity, anc) local ancestor pairs
        # kind 't' rows: (entity, anc=current top pointer)
        ent = batch["entity"]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        anc = batch["anc"]
        if isinstance(anc, pa.ChunkedArray):
            anc = anc.combine_chunks()
        ent = ent.cast(pa.string())
        anc = anc.cast(pa.string())
        both = pa.concat_arrays([ent, anc])
        codes, vals = _dict_codes(both)
        n = len(ent)
        e_codes, a_codes = codes[:n], codes[n:]
        parent_of = np.full(len(vals), -1, np.int64)
        parent_of[e_codes] = a_codes  # forest: one parent per child
        out_x: list[np.ndarray] = []
        out_a: list[np.ndarray] = []
        tops = a_codes.copy()
        node, cur, rid = e_codes, a_codes, np.arange(n)
        for _ in range(64):  # depth cap ≫ any real hierarchy
            out_x.append(node)
            out_a.append(cur)
            nxt = parent_of[cur]
            live = nxt >= 0
            if not live.any():
                break
            node, cur, rid = node[live], nxt[live], rid[live]
            tops[rid] = cur
        xs = np.concatenate(out_x)
        ancs = np.concatenate(out_a)
        vs = vals.cast(pa.string())
        return pa.table(
            {
                "kind": pa.array(["p"] * len(xs) + ["t"] * n, pa.string()),
                "entity": pa.concat_arrays(
                    [vs.take(pa.array(xs)), vs.take(pa.array(e_codes))]
                ),
                "anc": pa.concat_arrays(
                    [vs.take(pa.array(ancs)), vs.take(pa.array(tops))]
                ),
            }
        )

    def _split(tagged: ray.data.Dataset):
        pairs = tagged.map_batches(
            lambda t: t.filter(
                pc.equal(t["kind"], "p")
            ).select(["entity", "anc"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        tops = tagged.map_batches(
            lambda t: t.filter(
                pc.equal(t["kind"], "t")
            ).select(["entity", "anc"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return pairs, tops

    seeded = parents.map_batches(
        local_close, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    rel0, tops0 = _split(seeded)
    # initial distinct guards against duplicate input edges; afterwards the
    # jump rounds emit each new pair exactly once, so R grows by plain union
    rel = _pair_distinct(rel0, width).repartition(width).materialize()
    tops = tops0.repartition(width).materialize()

    def tag(kind: str, key_from: str):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[key_from]
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
            key = key.cast(pa.string())
            other = "anc" if key_from == "entity" else "entity"
            return pa.table(
                {
                    "key": key,
                    "kind": pa.array([kind] * len(batch), pa.string()),
                    "val": batch[other].combine_chunks().cast(pa.string())
                    if isinstance(batch[other], pa.ChunkedArray)
                    else batch[other].cast(pa.string()),
                    "__bucket": _bucket_col(key, width),
                }
            )

        return fn

    def jump(group: pa.Table) -> pa.Table:
        codes, vals = _dict_codes(group["key"])
        kind = group["kind"].combine_chunks()
        val_codes_src = pa.concat_arrays(
            [vals.cast(pa.string()), group["val"].combine_chunks().cast(pa.string())]
        )
        vcodes_all, vvals = _dict_codes(val_codes_src)
        nv = len(vals)
        key_v = vcodes_all[:nv]  # key k as a code in vvals space
        val_v = vcodes_all[nv:]
        qm = pc.equal(kind, "q").to_numpy(zero_copy_only=False)
        rm = pc.equal(kind, "r").to_numpy(zero_copy_only=False)
        sm = pc.equal(kind, "s").to_numpy(zero_copy_only=False)
        qk, qx = codes[qm], val_v[qm]
        rk, ra = codes[rm], val_v[rm]
        sk, st = codes[sm], val_v[sm]
        # segmented cross product per key: queries(k) × ancestors(k)
        qo = np.argsort(qk, kind="stable")
        ro = np.argsort(rk, kind="stable")
        qk_s, qx_s = qk[qo], qx[qo]
        rk_s, ra_s = rk[ro], ra[ro]
        cq = np.bincount(qk_s, minlength=nv)
        cr = np.bincount(rk_s, minlength=nv)
        m = cq * cr
        total = int(m.sum())
        vstr = vvals.cast(pa.string())
        if total:
            code_of = np.repeat(np.arange(nv), m)
            off = np.concatenate([[0], np.cumsum(m)[:-1]])
            within = np.arange(total) - np.repeat(off, m)
            oq = np.concatenate([[0], np.cumsum(cq)[:-1]])
            orr = np.concatenate([[0], np.cumsum(cr)[:-1]])
            crc = cr[code_of]
            x_idx = oq[code_of] + within // crc
            a_idx = orr[code_of] + within % crc
            px = qx_s[x_idx]
            pan = ra_s[a_idx]
        else:
            px = np.zeros(0, np.int64)
            pan = np.zeros(0, np.int64)
        # top jump: top'(x) = top(k) if k has one, else k (root-stable)
        st_of = np.full(nv, -1, np.int64)
        st_of[sk] = st
        cand = st_of[qk]
        new_top = np.where(cand >= 0, cand, key_v[qk])
        return pa.table(
            {
                "kind": pa.array(
                    ["p"] * len(px) + ["t"] * len(qx), pa.string()
                ),
                "entity": pa.concat_arrays(
                    [vstr.take(pa.array(px)), vstr.take(pa.array(qx))]
                ),
                "anc": pa.concat_arrays(
                    [vstr.take(pa.array(pan)), vstr.take(pa.array(new_top))]
                ),
            }
        )

    for _ in range(max_rounds):
        exchange = (
            tops.map_batches(tag("q", "anc"), batch_format="pyarrow", zero_copy_batch=True)
            .union(
                rel.map_batches(
                    tag("r", "entity"), batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .union(
                tops.map_batches(
                    tag("s", "entity"), batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("__bucket", num_partitions=width)
            .map_groups(jump, batch_format="pyarrow")
            .materialize()
        )
        new_pairs, tops = _split(exchange)
        tops = tops.repartition(width).materialize()
        n_new = new_pairs.count()
        if n_new == 0:
            break
        rel = rel.union(new_pairs).repartition(width).materialize()
    return rel


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered node-iterator)
# ---------------------------------------------------------------------------


def triangle_count(
    edges: ray.data.Dataset,
    num_buckets: int | None = None,
    broadcast_nodes_max: int = 50_000_000,
) -> int:
    """Global triangle count over an (a, b) int64 edge stream (direction,
    duplicates and self-loops welcome) — the classic clustering /
    spam-farm-detection statistic of a hyperlink graph.

    Degree-ordered node-iterator (the MapReduce-classic): orient every
    edge from its lower (degree, id) endpoint, generate wedges only from
    out-neighbor pairs, and close them with ONE semi-join back against
    the oriented edge set. Orientation caps every out-degree at O(√m),
    so total wedge volume is O(m^1.5) REGARDLESS of in-degree skew — a
    celebrity node with 10⁸ followers generates no wedges from its
    followers' side.

    Degree attach follows the pagerank pattern: node degrees are a
    node-bounded table, broadcast as two sorted numpy arrays while the
    node count is ≤ ``broadcast_nodes_max`` (the measured-cheap path);
    beyond that the SAME orientation runs through two bucketed hash
    joins (stages/join.py) — output-identical, one extra exchange pair.
    Dataflow: distinct + degree exchanges, the wedge exchange, and the
    closing semi-join; nothing edge- or wedge-sized touches the driver.
    """
    import numpy as np

    from lamapi_ray.stages.dedup import _pairs_in_runs, _run_bounds
    from lamapi_ray.stages.join import bucketed_hash_join, bucketed_semi_anti_join

    P = num_buckets or scaled_partitions(0.5, 16)

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # map-side distinct (lexsort + change detection — no id-width cap)
        # keeps the exchange edge-bounded per block
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        if len(lo):
            first = np.concatenate(
                [[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
            )
            lo, hi = lo[first], hi[first]
        return pa.table(
            {
                "a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64()),
            }
        )

    dedup = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"], num_partitions=P)
        .count()
        .select_columns(["a", "b"])
        .materialize()  # consumed twice: degrees + orientation
    )

    def ends(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

    deg = (
        dedup.map_batches(ends, batch_format="pyarrow")
        .groupby("node", num_partitions=P)
        .count()
        .materialize()  # node-bounded; consumed for count + the path taken
    )

    n_nodes = deg.count()
    if n_nodes <= broadcast_nodes_max:
        deg_tbl = pa.concat_tables(
            deg.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        nodes_np = deg_tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_np = deg_tbl["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes_np)
        deg_ref = ray.put((nodes_np[order], d_np[order]))

        def orient(batch: pa.Table) -> pa.Table:
            nodes_s, d_s = ray.get(deg_ref)
            a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            da = d_s[np.searchsorted(nodes_s, a)]
            db = d_s[np.searchsorted(nodes_s, b)]
            a_first = (da < db) | ((da == db) & (a < b))
            u = np.where(a_first, a, b)
            v = np.where(a_first, b, a)
            dv = np.where(a_first, db, da)
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "v": pa.array(v, pa.int64()),
                    "dv": pa.array(dv, pa.int64()),
                    "__pk": pa.array(u % np.int64(P), pa.int64()),
                }
            )

        oriented = dedup.map_batches(orient, batch_format="pyarrow")
    else:
        deg = deg.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "d": t["count()"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        j1 = bucketed_hash_join(
            dedup.map_batches(
                lambda t: t.rename_columns(["node", "b"]),
                batch_format="pyarrow",
            ),
            deg,
            on="node",
            num_buckets=P,
        )
        j2 = bucketed_hash_join(
            j1.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["b"],
                        "a": t["node"],
                        "da": t["d"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            deg,
            on="node",
            num_buckets=P,
        )

        def orient_joined(batch: pa.Table) -> pa.Table:
            b = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            da = batch["da"].to_numpy(zero_copy_only=False).astype(np.int64)
            db = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            a_first = (da < db) | ((da == db) & (a < b))
            u = np.where(a_first, a, b)
            v = np.where(a_first, b, a)
            dv = np.where(a_first, db, da)
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "v": pa.array(v, pa.int64()),
                    "dv": pa.array(dv, pa.int64()),
                    "__pk": pa.array(u % np.int64(P), pa.int64()),
                }
            )

        oriented = j2.map_batches(orient_joined, batch_format="pyarrow")

    # NOTE: oriented is deliberately NOT materialized — it is a pure map
    # over the already-materialized dedup set, so recomputing it for the
    # wedge and closing branches is cheaper than another barrier

    def wedges(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())}
        )
        if len(group) == 0:
            return empty
        u = group["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = group["v"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = group["dv"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((v, dv, u))
        u, v = u[order], v[order]
        starts, lens = _run_bounds([u])
        xs, ys = [], []
        for ia, ib in _pairs_in_runs(starts, lens):
            xs.append(v[ia])  # (dv, v)-sorted run → (x, y) already oriented
            ys.append(v[ib])
        if not xs:
            return empty
        return pa.table(
            {
                "x": pa.array(np.concatenate(xs), pa.int64()),
                "y": pa.array(np.concatenate(ys), pa.int64()),
            }
        )

    wedge_ds = oriented.groupby("__pk", num_partitions=P).map_groups(
        wedges, batch_format="pyarrow"
    )

    def edge_keys(batch: pa.Table) -> pa.Table:
        return pa.table({"x": batch["u"], "y": batch["v"]})

    closed = bucketed_semi_anti_join(
        wedge_ds,
        oriented.map_batches(edge_keys, batch_format="pyarrow"),
        on=["x", "y"],
        how="semi",
        num_buckets=P,
    )
    return sum(
        len(b)
        for b in closed.iter_batches(batch_size=1 << 16, batch_format="pyarrow")
    )


def hits(
    edges: ray.data.Dataset,
    iters: int = 2,
    num_buckets: int | None = None,
    src: str = "a",
    dst: str = "b",
) -> pa.Table:
    """Kleinberg HITS hubs/authorities over an (``src``, ``dst``) int64
    directed edge stream (multiplicity and self-loops kept as given) —
    the classic web-graph ranking pair complementing :func:`pagerank`.

    INTEGER-exact, un-normalized formulation: ``h_0 = 1`` per node, then
    per iteration ``a_k(v) = Σ_{(u,v)∈E} h_{k-1}(u)`` and
    ``h_k(u) = Σ_{(u,v)∈E} a_k(v)``. Skipping the per-iteration unit-norm
    division keeps every score an exact int64 (the ranking is identical —
    normalization is one positive scalar per iteration), which is what
    lets the DuckDB oracle restate the same ``2·iters`` unrolled
    join+group-sum rounds bit-exactly. Growth is checked, not hoped:
    before each half-iteration the fold is guarded by
    ``max_score ≤ 2^62 // max_fanin``, so overflow raises instead of
    wrapping; at real scale (or high ``iters``) shift scores right by the
    global max bit-length each round — same ranking, bounded magnitude.

    Dataflow per half-iteration (the pagerank broadcast path): the
    node-sized score vector rides ``ray.put`` as one sorted-key numpy
    lookup; every edge block folds scores map-side (``searchsorted`` +
    ``np.add.at``) and ONE node-bounded grouped exchange merges the
    partials — nothing edge-sized ever reaches the driver. Beyond ~50M
    nodes swap the broadcast for the Pregel two-exchange path exactly as
    :func:`pagerank` does (tag/scatter/gather); the fold is the same.

    Engine-first operator (the reference — lamAPI — stops at lookup
    serving); returns the node-bounded (node, authority, hub) table
    sorted by node.
    """
    P = num_buckets or scaled_partitions(0.5, 16)

    def ends(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-batch combiner: one unique + two bincounts per block
        both = np.concatenate([s, d])
        u, inv = np.unique(both, return_inverse=True)
        out_c = np.bincount(inv[: len(s)], minlength=len(u)).astype(np.int64)
        in_c = np.bincount(inv[len(s) :], minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(u, pa.int64()),
                "out_m": pa.array(out_c, pa.int64()),
                "in_m": pa.array(in_c, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    deg_tbl = pa.concat_tables(
        edges.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node", num_partitions=P)
        .aggregate(Sum("out_m", alias_name="out_m"), Sum("in_m", alias_name="in_m"))
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    nodes = deg_tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes, kind="stable")
    nodes = nodes[order]
    out_m = deg_tbl["out_m"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    in_m = deg_tbl["in_m"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def fold(vec: np.ndarray, weight_col: str, group_col: str, max_fanin: int):
        """One half-iteration: Σ vec[weight endpoint] grouped by the other
        endpoint. Map-side partial sums, one node-bounded exchange."""
        if vec.size and max_fanin and int(vec.max()) > (1 << 62) // max_fanin:
            raise ValueError(
                "hits: score magnitude would overflow int64 — lower iters "
                "or apply the documented per-round bit-shift rescale"
            )
        vec_ref = ray.put(vec)

        def scatter(batch: pa.Table, _v=vec_ref) -> pa.Table:
            keys = ray.get(nodes_ref)
            v = ray.get(_v)
            w_nodes = batch[weight_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            g_nodes = batch[group_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            w = v[np.searchsorted(keys, w_nodes)]  # every endpoint IS a node
            gu, ginv = np.unique(g_nodes, return_inverse=True)
            sums = np.zeros(len(gu), np.int64)
            np.add.at(sums, ginv, w)
            return pa.table(
                {
                    "node": pa.array(gu, pa.int64()),
                    "s": pa.array(sums, pa.int64()),
                    "__bucket": pa.array(gu % np.int64(P), pa.int64()),
                }
            )

        def merge(group: pa.Table) -> pa.Table:
            gn = group["node"].combine_chunks().to_numpy(zero_copy_only=False)
            gs = group["s"].combine_chunks().to_numpy(zero_copy_only=False)
            gu, ginv = np.unique(gn, return_inverse=True)
            sums = np.zeros(len(gu), np.int64)
            np.add.at(sums, ginv, gs)
            return pa.table(
                {"node": pa.array(gu, pa.int64()), "s": pa.array(sums, pa.int64())}
            )

        merged = pa.concat_tables(
            edges.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket", num_partitions=P)
            .map_groups(merge, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        out = np.zeros(n, np.int64)
        if len(merged):
            mh = merged["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            ms = merged["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            out[np.searchsorted(nodes, mh)] = ms
        return out

    max_in = int(in_m.max()) if n else 0
    max_out = int(out_m.max()) if n else 0
    h = np.ones(n, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(iters):
        a = fold(h, src, dst, max_in)  # authority ← Σ hub over in-edges
        h = fold(a, dst, src, max_out)  # hub ← Σ authority over out-edges
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "authority": pa.array(a, pa.int64()),
            "hub": pa.array(h, pa.int64()),
        }
    )


def personalized_pagerank(
    edges: ray.data.Dataset,
    iters: int = 3,
    src: str = "subj",
    dst: str = "obj",
    seed_mod: int = 17,
) -> ray.data.Dataset:
    """Personalized PageRank (random walk with restart): identical
    integer fixed-point recurrence to :func:`pagerank` except the teleport
    mass returns only to a SEED set — the KG-relatedness ranking
    (\"entities related to these seeds\") behind recommendation and
    entity-disambiguation pipelines, vs. the global importance PageRank
    measures. Seeds here are the deterministic rule
    ``numeric_qid % seed_mod == 0`` so the DuckDB oracle states the same
    set; a real caller passes any seed predicate.

    r_0(v) = [v∈S] · 10⁹//|S|;  r_t(v) = [v∈S] · (15·10⁹)//(100·|S|)
    + (85·Σ_{u→v} r_{t-1}(u)//out_deg(u)) // 100 — all-integer, so the
    oracle unrolls the same three iterations relationally and hashes
    match exactly.

    Execution is the broadcast path of :func:`pagerank` with a per-node
    teleport vector (node-sized state, one edge map + one node-bounded
    gather per iteration). On a node-hash collision (≈n²/2^61) this
    raises rather than silently degrading — the Pregel shuffle path
    generalizes by carrying the per-node base on the seed rows exactly as
    ``pagerank(mode="shuffle")`` does; wire that in if a corpus ever
    trips the check."""
    width = scaled_partitions(1.0, 8)
    edges = edges.materialize()
    if edges.num_blocks() < width:
        edges = edges.repartition(width).materialize()
    deg = degrees(edges, src, dst).repartition(width).materialize()

    def seed_fn(ent_sorted: pa.Array):
        qn = pc.cast(
            pc.utf8_slice_codeunits(ent_sorted.combine_chunks()
                                    if isinstance(ent_sorted, pa.ChunkedArray)
                                    else ent_sorted, 1),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        is_seed = (qn % seed_mod) == 0
        scnt = int(is_seed.sum())
        if scnt == 0:
            raise ValueError(f"personalized_pagerank: empty seed set (mod {seed_mod})")
        init = np.where(is_seed, PR_SCALE // scnt, 0).astype(np.int64)
        base = np.where(
            is_seed, ((PR_DEN - PR_NUM) * PR_SCALE) // (PR_DEN * scnt), 0
        ).astype(np.int64)
        return init, base

    out = _pagerank_broadcast(
        edges, deg, iters, width, 0, 0, src, dst, seed_fn=seed_fn
    )
    if out is None:
        raise RuntimeError(
            "personalized_pagerank: node-hash collision — extend the Pregel "
            "shuffle path with a per-node base column (see docstring)"
        )
    return out
