"""robots.txt parsing and URL admission (RFC 9309, the Robots Exclusion
Protocol) — the crawl-frontier filter every web-corpus pipeline runs
before fetching.

* **parser** (`parse_robots`): line-based per RFC 9309 §2.2 — groups are
  one or more consecutive ``User-agent`` lines followed by their
  ``Allow``/``Disallow`` rules; ``#`` comments stripped; field names
  case-insensitive; an empty ``Disallow:`` is a no-rule (allow-all);
  unknown fields ignored. ``*``/``$`` wildcard patterns (RFC 9309
  §2.2.3, which crawlers MUST support) are kept verbatim and matched
  at decision time: ``*`` spans any character sequence, a trailing
  ``$`` anchors the match at the end of the path, a non-trailing ``$``
  is a literal (the de-facto semantics of Google's reference matcher).
* **decision** (`robots_decide`): RFC 9309 §2.2.2 — the most specific
  matching rule wins, where specificity is the OCTET LENGTH OF THE RULE
  PATTERN itself (wildcard characters count, matching the reference
  matcher's priority); on a length tie Allow wins; no matching rule →
  allowed. Group selection: an exact user-agent group, if present,
  REPLACES ``*`` entirely (an empty matching group allows all).
* **stage** (`robots_filter`): per-host rule sets are tiny (a crawl's
  robots cache is ~hosts × a few rules), so they broadcast once via
  ``ray.put`` and each batch vectorizes the longest-match scan: one
  numpy ``startswith`` pass per (host, prefix-rule) over that host's
  row mask — rules-bounded work, no per-row Python. Wildcard rules
  (rare in real robots files) run a per-worker-compiled regex over the
  same host mask; the compile is LRU-cached per worker, not per batch.

At 10^9-host scale the robots cache stops being a broadcast; the
documented upgrade is hash-partitioning BOTH the url stream and the
rule table on host (the rules-side table is still tiny per partition,
so the per-batch kernel is unchanged).

Reference anchor: lamAPI has no crawl plane (it serves lookups over an
already-built index); the robots layer belongs to the web-corpus
ingestion surface this engine adds.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

Rule = tuple[bool, str]  # (allow, path_pattern)


def _is_wildcard(pattern: str) -> bool:
    return "*" in pattern or pattern.endswith("$")


@functools.lru_cache(maxsize=4096)
def _compile_wildcard(pattern: str) -> re.Pattern:
    """RFC 9309 §2.2.3 pattern → anchored-at-start regex: ``*`` spans any
    run of characters, a trailing ``$`` anchors at end-of-path, any other
    ``$`` is literal. Cached per worker process."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile(rx + (r"\Z" if anchored else ""))


def _rule_matches(pattern: str, path: str) -> bool:
    if _is_wildcard(pattern):
        return _compile_wildcard(pattern).match(path) is not None
    return path.startswith(pattern)


def synth_robots_text(h: int) -> str:
    """Deterministic robots.txt for synthetic host ``h`` (mixed-case
    fields, comments, sitemap/crawl-delay noise — parser exercise):

    * ``h % 4 == 1`` → a ``lamapi-bot`` group denying ``/p/``;
    * ``h % 4 == 3`` → a ``lamapi-bot`` group allowing ``/p/open/``
      over a ``/p/`` deny (longest-match precedence);
    * every host → a ``*`` group denying ``/private/``, plus
      ``h % 3 == 0`` → deny ``/p/`` / allow ``/p/open/`` and
      ``h % 5 == 2`` → deny ``/`` (both on h=12: 3-way precedence);
    * ``h % 7 == 4`` → a wildcard ``Disallow: /*7$`` in the ``*`` group
      (denies any path ending in ``7``; on h=11 it sits in a group the
      lamapi-bot group REPLACES, so it must stay invisible to the bot).
    """
    lines = [f"# robots for h{h}.example.com"]
    if h % 4 == 1:
        lines += ["User-Agent: lamapi-bot", "Disallow: /p/  # no crawl", ""]
    if h % 4 == 3:
        lines += ["user-agent: lamapi-bot", "Allow: /p/open/", "DISALLOW: /p/", ""]
    lines += ["User-agent: *", "Disallow: /private/"]
    if h % 3 == 0:
        lines += ["Disallow: /p/", "Allow: /p/open/"]
    if h % 5 == 2:
        lines += ["Disallow: /"]
    if h % 7 == 4:
        lines += ["Disallow: /*7$"]
    lines += ["Sitemap: https://example.com/sitemap.xml", "Crawl-delay: 2"]
    return "\n".join(lines)


def parse_robots(text: str) -> dict[str, list[Rule]]:
    """robots.txt → {user_agent_lower: [(allow, prefix), ...]}."""
    groups: dict[str, list[Rule]] = {}
    current_agents: list[str] = []
    rules_started = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_started:
                current_agents = []
                rules_started = False
            agent = value.lower()
            current_agents.append(agent)
            groups.setdefault(agent, [])
        elif field in ("allow", "disallow"):
            rules_started = True
            if not current_agents:
                continue  # rules before any user-agent line: ignored
            if not value:
                continue  # empty Disallow: == no rule (allow all)
            for agent in current_agents:
                groups[agent].append((field == "allow", value))
        # other fields (sitemap, crawl-delay, ...) are ignored per RFC
    return groups


def _effective_rules(
    groups: dict[str, list[Rule]], agent: str
) -> list[Rule]:
    """RFC group selection: the exact-agent group replaces '*' entirely."""
    agent = agent.lower()
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


def robots_decide(groups: dict[str, list[Rule]], agent: str, path: str) -> bool:
    """Longest-match decision (pattern octet length); tie → allow; no
    match → allow."""
    best_len = -1
    allowed = True
    for allow, pattern in _effective_rules(groups, agent):
        if _rule_matches(pattern, path):
            n = len(pattern)
            if n > best_len or (n == best_len and allow):
                best_len = n
                allowed = allow
    return allowed


def robots_filter(
    urls: ray.data.Dataset,
    robots_by_host: dict[str, dict[str, list[Rule]]],
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> ray.data.Dataset:
    """(host, path, ...) rows → same rows + ``allowed`` bool.

    ``robots_by_host`` maps host → parsed groups; hosts absent from the
    map are allowed (no robots.txt → no restrictions, per RFC)."""
    effective = {
        h: _effective_rules(g, agent) for h, g in robots_by_host.items()
    }
    rules_ref = ray.put(effective)

    def decide(batch: pa.Table) -> pa.Table:
        rules = ray.get(rules_ref)
        hosts = np.asarray(batch[host_col].to_pylist(), dtype=object)
        paths = np.asarray(batch[path_col].to_pylist(), dtype=object)
        allowed = np.ones(len(batch), dtype=bool)
        best = np.full(len(batch), -1, dtype=np.int64)
        for h in np.unique(hosts):
            hrules = rules.get(h)
            if not hrules:
                continue
            hmask = hosts == h
            hpaths = paths[hmask]
            h_best = best[hmask]
            h_allow = allowed[hmask]
            for allow, pattern in hrules:
                if _is_wildcard(pattern):
                    rx = _compile_wildcard(pattern)
                    m = np.fromiter(
                        (rx.match(s) is not None for s in hpaths),
                        dtype=bool,
                        count=len(hpaths),
                    )
                else:
                    m = np.char.startswith(hpaths.astype(str), pattern)
                n = len(pattern)
                upd = m & ((n > h_best) | ((n == h_best) & allow))
                h_best = np.where(m & (n > h_best), n, h_best)
                h_allow = np.where(upd, allow, h_allow)
            best[hmask] = h_best
            allowed[hmask] = h_allow
        return batch.append_column("allowed", pa.array(allowed, pa.bool_()))

    return urls.map_batches(decide, batch_format="pyarrow", zero_copy_batch=True)
