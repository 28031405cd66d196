"""Reference-architecture throughput baseline (single process, per-request).

Emulates the SHAPE of the reference system on our synthetic pages: one
Python process; for each page, scan mentions, then answer each mention with
a lamAPI-style lookup (retrieve + full scoring) through a memo cache (the
Mongo ``cache`` collection analogue — lookup_retriever.py:78-102), then emit
triples via per-page pair checks against an adjacency dict. Same algorithms
and index structures as the engine (so the comparison isolates
ARCHITECTURE: single-threaded request loop vs batched Ray dataflow), no Ray
in the timed section.

Usage: python tools/reference_style_baseline.py [sf_dir] [n_pages]
Prints one JSON line with pages/sec + triples/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from lamapi_ray import synth
    from lamapi_ray.index.surface import SurfaceIndex
    from lamapi_ray.pipelines.kg import KGContext
    from lamapi_ray.stages.extract import extract_text_batch
    from lamapi_ray.functions.text import clean_str
    from lamapi_ray.stages.mentions import _classify

    kg = synth.build_kg_tables(sf_dir)
    ctx = KGContext(kg["items"], kg["triples"])
    index = SurfaceIndex(ctx.surface_forms, ctx.type_names)
    adjacency: dict[tuple[str, str], list[str]] = {}
    for s, p, o in zip(
        kg["triples"]["subj"].to_pylist(),
        kg["triples"]["pred"].to_pylist(),
        kg["triples"]["obj"].to_pylist(),
    ):
        adjacency.setdefault((s, o), []).append(p)

    pages = []
    for b in synth.pages_dataset(sf_dir).iter_batches(
        batch_size=1000, batch_format="pyarrow"
    ):
        eb = extract_text_batch(b)
        pages.extend(zip(eb["url"].to_pylist(), eb["text"].to_pylist()))
        if len(pages) >= n_pages:
            break
    pages = pages[:n_pages]
    ray.shutdown()

    first_tokens = frozenset(s.split(" ", 1)[0] for s in ctx.vocab)
    cache: dict[str, list] = {}  # the Mongo `cache` analogue
    n_mentions = 0
    triples: set[tuple[str, str, str]] = set()

    t0 = time.perf_counter()
    for url, text in pages:
        tokens = clean_str(text).split(" ") if text else []
        seen = set()
        for i, tok in enumerate(tokens):
            if tok in first_tokens:
                for n in range(1, ctx.max_surface_tokens + 1):
                    if i + n > len(tokens):
                        break
                    w = " ".join(tokens[i : i + n])
                    if w in ctx.vocab:
                        seen.add(w)
        links = []
        for mention in sorted(seen):
            n_mentions += 1
            cands = cache.get(mention)
            if cands is None:
                cands = index.candidates(mention, 1000)  # the "HTTP lookup"
                cache[mention] = cands
            if cands:
                best = max(
                    cands,
                    key=lambda c: (
                        c["ed_score"] + c["jaccard_score"] + c["jaccardNgram_score"],
                        c["popularity"],
                        [-ord(ch) for ch in c["id"]],
                    ),
                )
                links.append(best["id"])
        ids = sorted(set(links))
        for x in ids:
            for y in ids:
                if x != y and (x, y) in adjacency:
                    for p in adjacency[(x, y)]:
                        triples.add((x, p, y))
        for tok in set(tokens):
            _classify(tok)
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "reference_style_single_process",
                "pages": len(pages),
                "wall_sec": round(wall, 3),
                "pages_per_sec": round(len(pages) / wall, 1),
                "mentions": n_mentions,
                "triples": len(triples),
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
