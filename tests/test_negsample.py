"""KG negative sampling (pipelines/extras.py::kg_negative_samples)."""

import pyarrow as pa

from lamapi_ray.pipelines import extras

SF = "/root/testdata/sf0.001"


def _adjacency():
    import duckdb

    con = duckdb.connect()
    for t in ["part", "supplier", "customer", "nation", "region", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con.execute(
        """
        SELECT 'Q' || (200000 + s_suppkey) AS subj, 'P2' AS pred,
               'Q' || (400000 + s_nationkey) AS obj FROM supplier
        UNION
        SELECT 'Q' || (400000 + n_nationkey), 'P4',
               'Q' || (500000 + n_regionkey) FROM nation
        """
    ).arrow()


def test_negatives_are_in_class_and_never_real(ray_session):
    adj = pa.Table.from_batches(_adjacency().to_batches())
    out = extras.kg_negative_samples(SF, adj)
    real = set(
        zip(
            adj["subj"].to_pylist(),
            adj["pred"].to_pylist(),
            adj["obj"].to_pylist(),
        )
    )
    neg = list(
        zip(
            out["subj"].to_pylist(),
            out["pred"].to_pylist(),
            out["neg_obj"].to_pylist(),
            out["k"].to_pylist(),
        )
    )
    assert len(neg) > 0
    by_cls = {}
    for s, p, o, k in neg:
        # never a real edge
        assert (s, p, o) not in real
        # class preserved: P2 objects are nations (Q4xxxxx), P4 regions
        want = "Q4" if p == "P2" else "Q5"
        assert o.startswith(want), (s, p, o)
        by_cls.setdefault((s, p), set()).add(k)
    # at most 2 per source edge, ks within {0,1}
    assert all(ks <= {0, 1} for ks in by_cls.values())
    # accidental-positive filtering can drop samples, but not everything
    assert len(neg) >= len(real)
