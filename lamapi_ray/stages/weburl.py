"""Web-URL curation operators — the Common-Crawl-side steps a webtext
corpus pipeline runs before any text-level dedup:

* :func:`normalize_urls` — vectorized RE2 URL canonicalization (lowercase
  scheme/host, strip ``www.`` and the scheme's default port, drop the
  fragment, remove ``utm_*`` tracking params, ``/`` for the empty path).
  Every step is a ``pyarrow.compute`` RE2 kernel so the DuckDB oracle can
  run the LITERAL same regex pipeline (DuckDB's regex engine is RE2 too)
  and match byte-for-byte. Unparseable strings normalize to null.
* :func:`url_normalize` — the streamed per-row form: appends
  ``url_norm`` + ``host`` columns; pure map, no shuffle.
* :func:`url_dedup` — exact dedup on the normalized URL: per-batch
  combine (min doc_id + count per distinct ``url_norm``) then ONE
  cluster-scaled grouped exchange (``Min`` + ``Sum``). Map-side output is
  bounded by the batch's distinct-URL count, so head-host skew never
  ships more than one partial row per (block, url).
* :func:`host_caps` — per-registrable-host frequency capping (the
  "max K pages per domain" rule of C4/RefinedWeb-style corpus assembly):
  map-side per-host top-K prune (each block forwards at most K rows per
  host regardless of skew), one grouped exchange, per-group final top-K.

No reference analogue (lamAPI serves a prebuilt KG); these are the
corpus-side operators the north-star's Common-Crawl input implies. The
synthetic raw-URL derivation used by the oracle-checked queries lives in
:func:`synth_raw_urls` (deterministic from ``doc_id``; the SQL oracle
mirrors it term-for-term).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from lamapi_ray.stages.dedup import scaled_partitions

# scheme/host/rest split; RE2, mirrored literally in the DuckDB oracle
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<hostport>[^/?#]*)(?P<rest>.*)$"
)


def synth_raw_urls(batch: pa.Table, id_col: str = "doc_id") -> pa.Array:
    """Deterministic Common-Crawl-style raw URL per doc_id (case noise in
    scheme/host, optional ``www.``, explicit default port, ``utm_*``
    tracking params, fragments). ``doc_id // 4`` is the page group: up to
    4 docs share a path so normalization produces real duplicates.

    The DuckDB oracle rebuilds the identical string with CASE arms
    (`__ray_entry__.py` ``_raw_url_sql``)."""
    did = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    g = did // 4
    s = lambda a: pa.array(a, pa.string())  # noqa: E731
    num = lambda a: pc.cast(pa.array(a), pa.string())  # noqa: E731

    scheme = pc.if_else(pa.array(did % 3 == 0), pa.scalar("HTTPS"), pa.scalar("https"))
    www = pc.if_else(
        pa.array(did % 5 == 0),
        pa.scalar("WWW."),
        pc.if_else(pa.array(did % 5 == 1), pa.scalar("www."), pa.scalar("")),
    )
    host_lo = pc.binary_join_element_wise(
        s(["h"] * len(did)), num(g % 37), s([".example.com"] * len(did)), ""
    )
    host = pc.if_else(pa.array(did % 13 == 0), pc.utf8_upper(host_lo), host_lo)
    port = pc.if_else(pa.array(did % 7 == 0), pa.scalar(":443"), pa.scalar(""))
    path = pc.binary_join_element_wise(s(["/p/"] * len(did)), num(g), "")
    qs = pc.if_else(
        pa.array(did % 6 == 0),
        pa.scalar("?utm_source=feed&ref=home"),
        pc.if_else(
            pa.array(did % 2 == 0),
            pa.scalar("?utm_source=feed"),
            pc.if_else(pa.array(did % 11 == 0), pa.scalar("?ref=home"), pa.scalar("")),
        ),
    )
    frag = pc.if_else(pa.array(did % 13 == 5), pa.scalar("#section-2"), pa.scalar(""))
    return pc.binary_join_element_wise(
        scheme, pa.scalar("://"), www, host, port, path, qs, frag, ""
    )


def normalize_urls(urls) -> tuple[pa.Array, pa.Array]:
    """→ (url_norm, host) arrays. Null where the string isn't a URL.

    Canonicalization rules (each an RE2 kernel, oracle-mirrored):
    fragment stripped; scheme+host lowercased; leading ``www.`` removed;
    default port (``:443`` https / ``:80`` http) removed, non-default
    ports kept; ``utm_*`` query params removed (``?`` dropped if the
    query empties); empty path → ``/``. Trailing slashes and percent-case
    are NOT touched (documented non-goals)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    u = pc.replace_substring_regex(urls, r"#.*$", "")
    parts = pc.extract_regex(u, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    hostport = pc.utf8_lower(pc.struct_field(parts, "hostport"))
    hostport = pc.replace_substring_regex(hostport, r"^www\.", "")
    hostport = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(hostport, r":443$", ""),
        hostport,
    )
    hostport = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(hostport, r":80$", ""),
        hostport,
    )
    host = pc.replace_substring_regex(hostport, r":[0-9]+$", "")
    rest = pc.struct_field(parts, "rest")
    # '&'-prefix every query param once, drop utm_*, then restore the '?'
    rest = pc.replace_substring_regex(rest, r"\?", "?&", max_replacements=1)
    rest = pc.replace_substring_regex(rest, r"&utm_[^&]*", "")
    rest = pc.replace_substring_regex(rest, r"\?&", "?", max_replacements=1)
    rest = pc.replace_substring_regex(rest, r"\?$", "")
    rest = pc.replace_substring_regex(rest, r"^\?", "/?", max_replacements=1)
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    norm = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), hostport, rest, ""
    )
    return norm, host


def url_normalize(ds: ray.data.Dataset, url_col: str = "url_raw") -> ray.data.Dataset:
    """Streamed per-row canonicalization: appends url_norm + host."""

    def add(batch: pa.Table) -> pa.Table:
        norm, host = normalize_urls(batch[url_col])
        return batch.append_column("url_norm", norm).append_column("host", host)

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _batch_group_min_count(keys: np.ndarray, ids: np.ndarray):
    """Per distinct key within one batch: (distinct keys, min id, count)."""
    uniq, inv, cnt = np.unique(keys, return_inverse=True, return_counts=True)
    mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(mins, inv, ids)
    return uniq, mins, cnt.astype(np.int64)


def url_dedup(
    ds: ray.data.Dataset, url_col: str = "url_norm", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """→ one row per distinct normalized URL: (url_norm, keeper = min id,
    n_dups). Map-side combine then ONE cluster-scaled grouped exchange —
    the standard exact-dedup dataflow keyed on the canonical URL."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[url_col].to_pylist(), dtype=object)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, mins, cnt = _batch_group_min_count(keys, ids)
        return pa.table(
            {
                url_col: pa.array(list(uniq), pa.string()),
                "__min": pa.array(mins, pa.int64()),
                "__cnt": pa.array(cnt, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(url_col, num_partitions=scaled_partitions(1.0, 32))
        .aggregate(Min("__min"), Sum("__cnt"))
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                url_col: batch[url_col],
                "keeper_doc_id": batch["min(__min)"].cast(pa.int64()),
                "n_dups": batch["sum(__cnt)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


def _prune_topk(host: np.ndarray, ids: np.ndarray, k: int):
    """Keep the k smallest ids per host (vectorized: factorize + lexsort +
    segment rank). Returns a keep-mask aligned to the SORTED order plus
    the sort permutation, so callers can also read the within-host rank."""
    uniq, inv = np.unique(host, return_inverse=True)
    order = np.lexsort((ids, inv))
    gi = inv[order]
    starts = np.r_[0, np.flatnonzero(np.diff(gi)) + 1]
    rank = np.arange(len(gi)) - np.repeat(starts, np.diff(np.r_[starts, len(gi)]))
    return order, rank, uniq, inv


def host_caps(
    ds: ray.data.Dataset,
    k: int = 3,
    host_col: str = "host",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-host frequency capping: keep the K smallest-id docs per host.
    → (host, doc_id, rk) with rk ∈ 1..K.

    Map-side prune forwards ≤ K rows per (block, host) — the exchange
    volume is host-cardinality-bounded, not page-count-bounded — then one
    grouped exchange finishes the global top-K per host."""

    def prune(batch: pa.Table) -> pa.Table:
        host = np.asarray(batch[host_col].to_pylist(), dtype=object)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order, rank, _, _ = _prune_topk(host, ids, k)
        keep = order[rank < k]
        return pa.table(
            {
                host_col: pa.array(list(host[keep]), pa.string()),
                id_col: pa.array(ids[keep], pa.int64()),
            }
        )

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def finish(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {
                    host_col: pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        ids = np.sort(group[id_col].to_numpy(zero_copy_only=False).astype(np.int64))[:k]
        return pa.table(
            {
                host_col: pa.array([group[host_col][0].as_py()] * len(ids), pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "rk": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64), pa.int64()),
            }
        )

    return pruned.groupby(
        host_col, num_partitions=scaled_partitions(0.5, 16)
    ).map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Public-suffix (eTLD+1) extraction — the "group by registrable domain"
# primitive behind per-domain caps, crawl budgets, and host dedup
# ---------------------------------------------------------------------------

# Baked-in rule subset exercising every PSL rule class (plain, wildcard,
# exception) — the publicsuffix.org algorithm; a production run broadcasts
# the full list file, the ALGORITHM below is list-size-independent.
PSL_RULES = [
    "com", "org", "net", "io", "uk", "jp", "ck",
    "co.uk", "org.uk", "ac.jp", "github.io",
    "*.ck", "!www.ck",
]


def _psl_parts() -> tuple[list[str], list[str], list[str]]:
    plain, wild, exc = [], [], []
    for r in PSL_RULES:
        if r.startswith("!"):
            exc.append(r[1:])
        elif r.startswith("*."):
            wild.append(r[2:])
        else:
            plain.append(r)
    return plain, wild, exc


def registrable_domains(hosts) -> tuple[pa.Array, pa.Array]:
    """hosts → (public_suffix, registrable_domain) per the PSL algorithm
    (publicsuffix.org): the prevailing rule is the matching rule with the
    most labels, ``*`` matches exactly one label, an exception rule wins
    outright and its suffix drops the rule's leftmost label, and an
    unmatched host falls to the implicit ``*`` rule (suffix = TLD). A host
    that IS a public suffix has a null registrable domain.

    Vectorized: ONE RE2 suffix test per rule (rules-bounded — assignment in
    ascending label-count order makes the longest match prevail, exceptions
    applied last), then one anchored extract per DISTINCT suffix label
    count. No per-row Python."""
    import re as _re

    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    n = len(hosts)
    labels_of = np.ones(n, np.int64)  # implicit '*' rule: TLD is the suffix
    plain, wild, exc = _psl_parts()
    rules = sorted(
        [(r.count(".") + 1, _re.escape(r)) for r in plain]
        + [(r.count(".") + 2, r"[^.]+\." + _re.escape(r)) for r in wild],
        key=lambda t: t[0],
    ) + [(r.count("."), _re.escape(r)) for r in exc]
    for k, pat in rules:
        m = pc.match_substring_regex(hosts, r"(?:^|\.)" + pat + r"$")
        labels_of[m.to_numpy(zero_copy_only=False)] = k

    suffix = np.full(n, None, dtype=object)
    registrable = np.full(n, None, dtype=object)
    for k in np.unique(labels_of):
        mask = labels_of == k
        sub = hosts.filter(pa.array(mask))
        tail = r"(?:\.[^.]+){%d})$"
        sufpat = r"(?:^|\.)(?P<x>[^.]+" + tail % (k - 1)
        regpat = r"(?:^|\.)(?P<x>[^.]+" + tail % k
        suffix[mask] = pc.struct_field(
            pc.extract_regex(sub, sufpat), "x"
        ).to_numpy(zero_copy_only=False)
        registrable[mask] = pc.struct_field(
            pc.extract_regex(sub, regpat), "x"
        ).to_numpy(zero_copy_only=False)
    return (
        pa.array(suffix.tolist(), pa.string()),
        pa.array(registrable.tolist(), pa.string()),
    )


def registrable_domain_stage(
    ds: ray.data.Dataset, host_col: str = "host"
) -> ray.data.Dataset:
    """Appends ``public_suffix`` + ``registrable`` columns — pure map, no
    shuffle; the rule set rides in the task closure (tiny)."""

    def add(batch: pa.Table) -> pa.Table:
        suf, reg = registrable_domains(batch[host_col])
        return batch.append_column("public_suffix", suf).append_column(
            "registrable", reg
        )

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
