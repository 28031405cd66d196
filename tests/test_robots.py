"""robots.txt parser + RFC 9309 decision semantics (stages/robots.py)."""

import pyarrow as pa
import pytest
import ray.data

from lamapi_ray.stages.robots import (
    parse_robots,
    robots_decide,
    robots_filter,
    synth_robots_text,
)


def test_parser_groups_comments_case_and_empty_disallow():
    g = parse_robots(
        "# header comment\n"
        "User-Agent: FooBot\n"
        "User-agent: BarBot\n"
        "Disallow: /x/  # trailing comment\n"
        "Allow: /x/ok/\n"
        "\n"
        "user-agent: *\n"
        "disallow:\n"  # empty = allow-all, no rule
        "Disallow: /y/\n"
        "Sitemap: https://e.com/s.xml\n"
    )
    assert g["foobot"] == [(False, "/x/"), (True, "/x/ok/")]
    assert g["barbot"] == g["foobot"]
    assert g["*"] == [(False, "/y/")]


def test_rules_before_any_group_are_ignored():
    g = parse_robots("Disallow: /a/\nUser-agent: *\nDisallow: /b/\n")
    assert g == {"*": [(False, "/b/")]}


def test_wildcard_star_and_dollar_semantics():
    g = parse_robots(
        "User-agent: *\n"
        "Disallow: /*.php$\n"
        "Allow: /shop/*.php$\n"
        "Disallow: /tmp*\n"
    )
    # '$' anchors at end of path
    assert robots_decide(g, "x", "/a/b.php") is False
    assert robots_decide(g, "x", "/a/b.php?q=1") is True  # not at end
    # longer wildcard allow (len 12) outranks the shorter deny (len 7)
    assert robots_decide(g, "x", "/shop/x.php") is True
    # '*' spans any run, including empty
    assert robots_decide(g, "x", "/tmp") is False
    assert robots_decide(g, "x", "/tmpfiles/a") is False
    assert robots_decide(g, "x", "/other") is True
    # regex metacharacters in patterns stay literal
    lit = parse_robots("User-agent: *\nDisallow: /a.b/\n")
    assert robots_decide(lit, "x", "/aXb/") is True
    assert robots_decide(lit, "x", "/a.b/") is False
    # non-trailing '$' is a literal character
    mid = parse_robots("User-agent: *\nDisallow: /x$y\n")
    assert robots_decide(mid, "x", "/x$y/z") is False
    assert robots_decide(mid, "x", "/xy/z") is True


def test_decision_longest_match_tie_and_group_replacement():
    g = parse_robots(
        "User-agent: bot\n"
        "Allow: /p/open/\n"
        "Disallow: /p/\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    assert robots_decide(g, "bot", "/p/x") is False
    assert robots_decide(g, "bot", "/p/open/x") is True
    # exact group REPLACES '*': /q is not covered by bot's rules -> allow
    assert robots_decide(g, "bot", "/q") is True
    assert robots_decide(g, "other", "/q") is False
    # tie between allow and disallow of equal length -> allow
    tie = parse_robots("User-agent: *\nAllow: /d/\nDisallow: /d/\n")
    assert robots_decide(tie, "x", "/d/z") is True
    # empty matching group allows everything
    empty = parse_robots("User-agent: bot\nDisallow:\nUser-agent: *\nDisallow: /\n")
    assert robots_decide(empty, "bot", "/anything") is True


def test_filter_stage_matches_scalar_decision(ray_session):
    hosts = [f"h{h}.example.com" for h in range(17)]
    robots = {hh: parse_robots(synth_robots_text(h)) for h, hh in enumerate(hosts)}
    rows = []
    for did in range(200):
        h, c = did % 17, did % 4
        path = ["/p/", "/p/open/", "/private/", "/"][c] + str(did)
        rows.append((f"h{h}.example.com", path))
    rows.append(("unlisted.example.com", "/private/x"))  # no robots -> allow
    ds = ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(3)
    out = pa.concat_tables(
        robots_filter(ds, robots, "lamapi-bot").iter_batches(
            batch_size=4096, batch_format="pyarrow"
        )
    )
    got = dict(
        zip(
            zip(out["host"].to_pylist(), out["path"].to_pylist()),
            out["allowed"].to_pylist(),
        )
    )
    for host, path in rows:
        want = (
            robots_decide(robots[host], "lamapi-bot", path)
            if host in robots
            else True
        )
        assert got[(host, path)] == want, (host, path)
    assert got[("unlisted.example.com", "/private/x")] is True
