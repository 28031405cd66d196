"""Multimodal plumbing + LSH-ANN + near-dup cosine stage tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lamapi_ray.stages.annsearch import (
    auto_planes,
    cosine_near_pairs,
    cosine_topk,
    exact_cosine_near_pairs,
    lsh_topk,
)
from lamapi_ray.stages.multimodal import PayloadDecoder, attach_payload, decode_payloads


def test_payload_decoder_deterministic():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"abc", b""], pa.binary()),
        }
    )
    dec = PayloadDecoder()
    out = dec(batch)
    assert out["width"].to_pylist() == [1 + 3 % 640, 1]
    assert out["height"].to_pylist() == [1 + 21 % 480, 1]
    assert out["mean_byte"][0].as_py() == pytest.approx(
        (ord("a") + ord("b") + ord("c")) / 3, abs=1e-4
    )
    assert out["mean_byte"][1].as_py() == 0.0


def test_payload_decoder_real_path_decodes_bmp_and_gates_compressed():
    import numpy as np

    from lamapi_ray.functions.imagecodec import encode_bmp

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([encode_bmp(img)], pa.binary()),
        }
    )
    out = PayloadDecoder(mode="real")(batch)
    assert out["width"][0].as_py() == 4
    assert out["height"][0].as_py() == 6
    assert out["mean_pixel"][0].as_py() == pytest.approx(float(img.mean()), abs=1e-4)
    # baseline JPEG is now REAL (pure-numpy codec) — decodes through the pool
    from lamapi_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

    jp = encode_jpeg(img, quality=95)
    jpeg_batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([jp], pa.binary()),
        }
    )
    jout = PayloadDecoder(mode="real")(jpeg_batch)
    assert jout["width"][0].as_py() == 4
    assert jout["height"][0].as_py() == 6
    assert jout["mean_pixel"][0].as_py() == pytest.approx(
        float(decode_jpeg(jp).mean()), abs=1e-4
    )
    # PNG is fully real — Adam7 interlacing AND packed 1/2/4-bit depths
    from lamapi_ray.functions.pngcodec import encode_png, encode_png_gray

    img2 = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    adam7 = encode_png(img2, filter_type=2, interlace=True)
    png_batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([adam7], pa.binary()),
        }
    )
    pout = PayloadDecoder(mode="real")(png_batch)
    assert pout["mean_pixel"][0].as_py() == pytest.approx(float(img2.mean()), abs=1e-9)
    g4 = np.array([[0, 5], [10, 15]], dtype=np.uint8)  # 4-bit samples
    packed = encode_png_gray(g4, depth=4, filter_type=1)
    packed_batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([packed], pa.binary()),
        }
    )
    kout = PayloadDecoder(mode="real")(packed_batch)
    # 4-bit gray scales by 17 (255/15): mean of {0,85,170,255}
    assert kout["mean_pixel"][0].as_py() == pytest.approx(127.5, abs=1e-9)


def test_decode_payloads_actor_pool():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["aa", "bbb", "c"], pa.string()),
            }
        )
    )
    out = pa.concat_tables(
        b
        for b in decode_payloads(attach_payload(docs), concurrency=1).iter_batches(
            batch_size=1024, batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    assert out["doc_id"].to_pylist() == [1, 2, 3]
    assert out.column_names == ["doc_id", "width", "height", "mean_byte"]


def _corpus(n=60, d=16, seed=3):
    rng = np.random.RandomState(seed)
    emb = rng.rand(n, d)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb]),
        }
    ), emb


def test_lsh_topk_is_subset_quality_bounded():
    tbl, emb = _corpus()
    ds = ray.data.from_arrow(tbl)
    queries = emb[:2] + 0.001  # near-identical to corpus vectors 0 and 1
    exact = cosine_topk(ds, queries, np.array([0, 1]), k=5)
    approx = lsh_topk(ds, queries, np.array([0, 1]), k=5)
    # LSH must return ranked rows per query and find the near-identical
    # vector as the top neighbour (it collides in every band)
    for qid in (0, 1):
        ex = [n for q, n in zip(exact["query_id"].to_pylist(), exact["neighbor_id"].to_pylist()) if q == qid]
        ap = [n for q, n in zip(approx["query_id"].to_pylist(), approx["neighbor_id"].to_pylist()) if q == qid]
        assert ex[0] == qid
        assert ap and ap[0] == qid


def test_cosine_near_pairs_exact_dups_only():
    tbl, emb = _corpus(n=20)
    # duplicate vectors 0 and 7 under new ids
    dup = pa.table(
        {
            "vec_id": pa.array([100, 107], pa.int64()),
            "embedding": pa.array(
                [list(map(float, emb[0])), list(map(float, emb[7]))]
            ),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([tbl, dup]))
    out = cosine_near_pairs(ds, threshold=0.999)
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert pairs == {(0, 100), (7, 107)}
    assert all(c >= 0.999 for c in out["cosine"].to_pylist())


def test_exact_near_pairs_matches_brute_force_and_lsh_on_fixture():
    tbl, emb = _corpus(n=50)
    dup = pa.table(
        {
            "vec_id": pa.array([100, 107], pa.int64()),
            "embedding": pa.array(
                [list(map(float, emb[0])), list(map(float, emb[7]))]
            ),
        }
    )
    full = pa.concat_tables([tbl, dup])
    ds = ray.data.from_arrow(full)
    # local brute force at a loose threshold (so near-but-not-dup pairs
    # exist and the chunk-pair blocking is genuinely exercised)
    m = np.asarray(full["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
    ids = np.asarray(full["vec_id"].to_pylist())
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    thr = 0.92
    want = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(iu[0][sims[iu] >= thr], iu[1][sims[iu] >= thr])
    }
    assert len(want) > 2  # loose threshold produced non-duplicate pairs
    got = exact_cosine_near_pairs(ds, threshold=thr, num_chunks=4)
    got_pairs = set(zip(got["id_a"].to_pylist(), got["id_b"].to_pylist()))
    assert got_pairs == want
    # each pair appears exactly once (blocking computes it in one bucket)
    assert len(got) == len(got_pairs)
    # LSH scale path finds the exact duplicates at the tight threshold and,
    # on this fixture, agrees with the exact path
    lsh = cosine_near_pairs(ds, threshold=0.999, planes=None)
    ex = exact_cosine_near_pairs(ds, threshold=0.999)
    assert set(zip(lsh["id_a"].to_pylist(), lsh["id_b"].to_pylist())) == set(
        zip(ex["id_a"].to_pylist(), ex["id_b"].to_pylist())
    ) == {(0, 100), (7, 107)}


@pytest.mark.parametrize("tile", [1, 3, 7, 64])
def test_emit_pairs_tiling_kernel(tile):
    # tiny tiles exercise the tiled-matmul path (incl. diagonal masking
    # for the triangle case and non-square edge tiles); the pair set must
    # be tile-size-independent
    from lamapi_ray.stages.annsearch import _emit_pairs

    _, emb = _corpus(n=23)
    m = emb / np.sqrt((emb * emb).sum(axis=1, keepdims=True))
    ids = np.arange(23, dtype=np.int64) * 10
    sims = m @ m.T
    iu = np.triu_indices(23, k=1)
    thr = 0.88
    want_tri = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(iu[0][sims[iu] >= thr], iu[1][sims[iu] >= thr])
    }
    assert want_tri  # fixture sanity
    out = []
    _emit_pairs(ids, m, ids, m, thr, True, out, tile=tile)
    got = {
        (int(a), int(b))
        for t in out
        for a, b in zip(t[0], t[1])
    }
    assert got == want_tri
    # cross-block case: split rows into two halves, want all cross pairs
    ha, hb = slice(0, 11), slice(11, 23)
    want_x = {
        (int(ids[i]), int(ids[j]))
        for i in range(11)
        for j in range(11, 23)
        if sims[i, j] >= thr
    }
    out = []
    _emit_pairs(ids[ha], m[ha], ids[hb], m[hb], thr, False, out, tile=tile)
    got = {(int(a), int(b)) for t in out for a, b in zip(t[0], t[1])}
    assert got == want_x


def test_auto_planes_scales_with_corpus():
    assert auto_planes(100) == 16
    assert auto_planes(1_000_000) == 28
    assert auto_planes(10**9) == 38
    assert auto_planes(10**18) == 64  # clamped


def test_resize_and_frame_sample_stages():
    import numpy as np

    from lamapi_ray.functions.imagecodec import decode_bmp
    from lamapi_ray.stages.multimodal import (
        attach_image_payload,
        attach_video_payload,
        resize_payloads,
        sample_frames,
        synth_image,
        synth_video,
    )

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5], pa.int64()),
                "text": pa.array(["x"], pa.string()),
            }
        )
    )
    rz = pa.concat_tables(
        b
        for b in resize_payloads(
            attach_image_payload(docs), 16, 16, concurrency=1
        ).iter_batches(batch_size=64, batch_format="pyarrow")
    )
    assert rz["width"][0].as_py() == 16 and rz["height"][0].as_py() == 16
    # the re-encoded payload decodes back to the exact nearest-neighbor grid
    from lamapi_ray.functions.imagecodec import resize_nearest

    expect = resize_nearest(synth_image(5), 16, 16)
    got = decode_bmp(rz["payload"][0].as_py())
    assert np.array_equal(got, expect)

    fr = pa.concat_tables(
        b
        for b in sample_frames(
            attach_video_payload(docs), stride=2, concurrency=1
        ).iter_batches(batch_size=64, batch_format="pyarrow")
    )
    clip = synth_video(5)  # 7 frames -> sampled 0,2,4,6
    assert fr["frame"].to_pylist() == [0, 2, 4, 6]
    for row, f in enumerate([0, 2, 4, 6]):
        assert fr["mean_pixel"][row].as_py() == pytest.approx(
            float(clip[f].mean()), abs=1e-4
        )


def test_ivf_topk_probed_rerank_matches_naive():
    """IVF result == naive recompute of the same contract (assign to argmax
    centroid, probe top-n_probe lists per query, exact cosine rerank)."""
    from lamapi_ray.stages.annsearch import ivf_topk

    tbl, emb = _corpus(n=80, d=12, seed=11)
    ds = ray.data.from_arrow(tbl)
    queries = emb[:3] + 0.002
    qids = np.array([100, 101, 102])
    centroids = emb[:8]  # deterministic: first 8 corpus vectors
    got = ivf_topk(ds, queries, qids, centroids, k=5, n_probe=3)

    def norm(m):
        m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        return m

    cn, qn, mn = norm(centroids.astype(float)), norm(queries.astype(float)), norm(emb.astype(float))
    assign = np.argmax(mn @ cn.T, axis=1)
    rows = []
    for qi in range(3):
        sims = qn[qi] @ cn.T
        probed = np.lexsort((np.arange(len(cn)), -sims))[:3]
        cand = np.flatnonzero(np.isin(assign, probed))
        cos = mn[cand] @ qn[qi]
        order = sorted(zip(-cos, cand))[:5]
        for rank, (negc, ci) in enumerate(order, 1):
            rows.append((int(qids[qi]), int(ci), rank))
    got_rows = list(
        zip(
            got["query_id"].to_pylist(),
            got["neighbor_id"].to_pylist(),
            got["rank"].to_pylist(),
        )
    )
    assert sorted(got_rows) == sorted(rows)


def test_ivf_topk_probe_wider_than_centroids_is_exact():
    """n_probe >= n_centroids degrades to exact brute force."""
    from lamapi_ray.stages.annsearch import cosine_topk, ivf_topk

    tbl, emb = _corpus(n=50, d=10, seed=5)
    ds = ray.data.from_arrow(tbl)
    queries = emb[:2] + 0.001
    qids = np.array([0, 1])
    exact = cosine_topk(ds, queries, qids, k=5)
    ivf = ivf_topk(ds, queries, qids, emb[:4], k=5, n_probe=4)
    assert exact.to_pylist() == ivf.to_pylist()
