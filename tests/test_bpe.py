"""Distributed BPE trainer (stages/bpe.py) vs an independent scalar
reference implementation."""

import pyarrow as pa
import ray.data

from lamapi_ray.stages.bpe import encode_word, train_bpe, word_freq_table


def _ref_bpe(texts, num_merges):
    """Scalar reference: word-freq table, exact pair counts, argmax with
    (count desc, (left, right) lexicographic asc) tie-break."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(t.split(" "))
    symbols = {w: list(w) for w in wf}
    merges = []
    for r in range(num_merges):
        pc_ = Counter()
        for w, n in wf.items():
            s = symbols[w]
            for i in range(len(s) - 1):
                pc_[(s[i], s[i + 1])] += n
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r_), c = best
        merges.append((r, l, r_, c))
        for w in symbols:
            s = symbols[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r_:
                    out.append(l + r_)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symbols[w] = out
    return merges


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "low low low newer newest",
]


def test_merge_table_matches_reference(ray_session):
    got = train_bpe(_ds(CORPUS), num_merges=8)
    want = _ref_bpe(CORPUS, 8)
    rows = list(
        zip(
            got["rank"].to_pylist(),
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["pair_count"].to_pylist(),
        )
    )
    assert rows == want


def test_word_freqs_and_encoding_roundtrip(ray_session):
    wf = word_freq_table(_ds(CORPUS))
    d = dict(zip(wf["word"].to_pylist(), wf["n"].to_pylist()))
    assert d["low"] == 7 and d["newer"] == 3
    got = train_bpe(_ds(CORPUS), num_merges=6)
    merges = list(zip(got["left"].to_pylist(), got["right"].to_pylist()))
    # encoding applies merges in rank order; concatenation restores the word
    for w in ("lowest", "newer", "wide"):
        toks = encode_word(w, merges)
        assert "".join(toks) == w
        assert len(toks) <= len(w)


def test_tiebreak_is_lexicographic(ray_session):
    # 'ab' and 'ba' pairs appear equally often -> ('a','b') must win
    texts = ["ab ab ba ba"]
    got = train_bpe(_ds(texts), num_merges=1)
    assert got["left"].to_pylist() == ["a"]
    assert got["right"].to_pylist() == ["b"]
