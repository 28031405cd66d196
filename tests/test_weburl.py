"""URL canonicalization + per-host capping (stages/weburl.py)."""

import numpy as np
import pyarrow as pa

from lamapi_ray.stages.weburl import (
    _batch_group_min_count,
    _prune_topk,
    normalize_urls,
    synth_raw_urls,
)


def norm1(u: str):
    n, h = normalize_urls(pa.array([u], pa.string()))
    return n[0].as_py(), h[0].as_py()


def test_normalize_lowercases_scheme_and_host_only():
    n, h = norm1("HTTPS://WWW.Example.COM/Path/To?Q=AbC")
    assert n == "https://example.com/Path/To?Q=AbC"
    assert h == "example.com"


def test_normalize_strips_default_port_keeps_custom():
    assert norm1("https://a.com:443/x")[0] == "https://a.com/x"
    assert norm1("http://a.com:80/x")[0] == "http://a.com/x"
    # non-default port survives in the norm, never in the host column
    n, h = norm1("https://a.com:8443/x")
    assert n == "https://a.com:8443/x"
    assert h == "a.com"
    # http's default port is NOT https' default
    assert norm1("http://a.com:443/x")[0] == "http://a.com:443/x"


def test_normalize_fragment_and_utm():
    assert norm1("https://a.com/x#frag")[0] == "https://a.com/x"
    # utm-only query: the '?' goes away entirely
    assert norm1("https://a.com/x?utm_source=f")[0] == "https://a.com/x"
    # mixed: utm params drop, the rest keeps the '?'
    assert (
        norm1("https://a.com/x?utm_source=f&ref=home&utm_campaign=c")[0]
        == "https://a.com/x?ref=home"
    )
    # utm in the middle
    assert (
        norm1("https://a.com/x?a=1&utm_x=2&b=3")[0] == "https://a.com/x?a=1&b=3"
    )


def test_normalize_empty_path_and_bare_query():
    assert norm1("https://a.com")[0] == "https://a.com/"
    assert norm1("https://a.com?ref=1")[0] == "https://a.com/?ref=1"
    assert norm1("https://www.a.com#f")[0] == "https://a.com/"


def test_normalize_non_url_is_null():
    n, h = norm1("not a url")
    assert n is None and h is None


def test_synth_raw_urls_deterministic_and_parseable():
    batch = pa.table({"doc_id": pa.array(list(range(200)), pa.int64())})
    raw = synth_raw_urls(batch)
    norm, host = normalize_urls(raw)
    assert norm.null_count == 0
    # group g = doc_id // 4 collapses to one path
    for i in (4, 5, 6, 7):
        assert f"/p/{i // 4}" in norm[i].as_py()
    # normalized scheme/host always canonical
    for v in norm.to_pylist():
        assert v.startswith("https://h")
        assert ".example.com/p/" in v
        assert "utm_" not in v and "#" not in v and ":443" not in v


def test_batch_group_min_count():
    keys = np.array(["b", "a", "b", "a", "c"], dtype=object)
    ids = np.array([5, 2, 3, 7, 1], dtype=np.int64)
    uniq, mins, cnt = _batch_group_min_count(keys, ids)
    assert list(uniq) == ["a", "b", "c"]
    assert list(mins) == [2, 3, 1]
    assert list(cnt) == [2, 2, 1]


def test_prune_topk_rank():
    host = np.array(["x", "y", "x", "x", "y"], dtype=object)
    ids = np.array([30, 1, 10, 20, 2], dtype=np.int64)
    order, rank, _, _ = _prune_topk(host, ids, 2)
    kept = sorted(zip(host[order[rank < 2]], ids[order[rank < 2]]))
    assert kept == [("x", 10), ("x", 20), ("y", 1), ("y", 2)]


def test_url_dedup_and_host_caps_end_to_end(ray_session):
    import ray

    from lamapi_ray.stages.weburl import host_caps, url_dedup, url_normalize

    batch = pa.table({"doc_id": pa.array(list(range(120)), pa.int64())})
    ds = ray.data.from_arrow(batch).map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "url_raw": synth_raw_urls(b)}),
        batch_format="pyarrow",
    )
    normed = url_normalize(ds)
    dd = url_dedup(normed).to_arrow_refs()
    dd = pa.concat_tables([ray.get(r) for r in dd])
    # every keeper is the min doc_id of its group and counts sum to input
    assert dd.column("n_dups").to_pylist() and sum(
        dd.column("n_dups").to_pylist()
    ) == 120
    caps = host_caps(url_normalize(ds), k=3)
    capped = pa.concat_tables([ray.get(r) for r in caps.to_arrow_refs()])
    import collections

    per_host = collections.Counter(capped.column("host").to_pylist())
    assert max(per_host.values()) <= 3
    assert set(capped.column("rk").to_pylist()) <= {1, 2, 3}


def test_normalize_idempotent_property():
    """normalize(normalize(u)) == normalize(u) — the canonicalizer fixed
    point — over a generated grid of URL shapes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scheme = st.sampled_from(["http", "HTTPS", "https", "HtTp"])
    host = st.from_regex(r"(WWW\.|www\.)?[A-Za-z][A-Za-z0-9\-]{0,10}\.(com|ORG|net)", fullmatch=True)
    port = st.sampled_from(["", ":443", ":80", ":8080"])
    path = st.from_regex(r"(/[A-Za-z0-9._~\-]{0,8}){0,3}", fullmatch=True)
    query = st.sampled_from(
        ["", "?a=1", "?utm_source=x", "?utm_a=1&b=2", "?b=2&utm_a=1&c=3",
         "?utm_x=1&utm_y=2"]
    )
    frag = st.sampled_from(["", "#f", "#sec-2"])

    @settings(max_examples=200, deadline=None)
    @given(scheme, host, port, path, query, frag)
    def check(s, h, p, pth, q, f):
        u = f"{s}://{h}{p}{pth}{q}{f}"
        n1, _ = normalize_urls(pa.array([u], pa.string()))
        v1 = n1[0].as_py()
        assert v1 is not None
        n2, _ = normalize_urls(pa.array([v1], pa.string()))
        assert n2[0].as_py() == v1

    check()


def test_registrable_domains_psl_semantics():
    import pyarrow as pa

    from lamapi_ray.stages.weburl import registrable_domains

    hosts = pa.array(
        [
            "a.b.site.com",      # deep host: reg keeps only eTLD+1
            "a.org.uk",          # 2-label rule beats the 1-label 'uk'
            "b.uk",              # bare 'uk' rule
            "foo.bar.ck",        # wildcard consumes one label
            "bar.ck",            # host IS the wildcard suffix -> null reg
            "www.ck",            # exception: suffix 'ck', reg 'www.ck'
            "x.www.ck",          # exception matches below too
            "site.unknowntld",   # implicit '*' fallback
            "com",               # bare suffix -> null reg
            "ck",                # plain rule, no wildcard label -> null reg
        ]
    )
    suf, reg = registrable_domains(hosts)
    assert suf.to_pylist() == [
        "com", "org.uk", "uk", "bar.ck", "bar.ck", "ck", "ck",
        "unknowntld", "com", "ck",
    ]
    assert reg.to_pylist() == [
        "site.com", "a.org.uk", "b.uk", "foo.bar.ck", None, "www.ck",
        "www.ck", "site.unknowntld", None, None,
    ]


def test_registrable_domain_stage_appends_columns(ray_session):
    import pyarrow as pa
    import ray.data

    from lamapi_ray.stages.weburl import registrable_domain_stage

    ds = ray.data.from_arrow(
        pa.table({"host": pa.array(["x.co.uk", "y.com"], pa.string())})
    )
    out = pa.concat_tables(
        registrable_domain_stage(ds).iter_batches(
            batch_size=16, batch_format="pyarrow"
        )
    )
    assert out.column_names == ["host", "public_suffix", "registrable"]
    assert out["registrable"].to_pylist() == ["x.co.uk", "y.com"]
