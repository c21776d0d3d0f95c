

def test_ivf_rebuild_resets_baseline_and_preserves_vectors(spark, tmp_path):
    """ivf_index_rebuild closes the index lifecycle: after drifted
    appends, the rebuild retrains on the indexed vectors themselves —
    same ids/vectors, fresh quantizer, stats history reset to one
    build row — and a post-rebuild append of in-distribution data
    scores staleness ~0 against the NEW baseline."""
    import numpy as np
    from pyspark.sql import functions as F

    from skopje_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_rebuild,
        ivf_index_write,
    )

    rng = np.random.RandomState(7)

    def frame(center, n, start):
        rows = []
        for i in range(n):
            v = center + rng.normal(0, 0.05, 4)
            v = v / np.linalg.norm(v)
            rows.append((start + i, [float(x) for x in v]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    a = frame(np.array([1.0, 0, 0, 0]), 40, 0)
    b = frame(np.array([0, 1.0, 0, 0]), 40, 100)
    path = str(tmp_path / "ivfreb")
    ivf_index_write(a.unionByName(b), path, k=2, iters=3)
    # drifted appends: a THIRD cluster the frozen quantizer never saw
    c = frame(np.array([0, 0, 1.0, 0]), 40, 200)
    rep = ivf_index_append(c, path)
    assert rep["staleness_drop"] is not None and rep["staleness_drop"] > 0.1

    ivf_index_rebuild(spark, path, k=3, iters=4)
    vecs = spark.read.parquet(f"{path}/vectors")
    assert vecs.count() == 120  # every vector survived the rebuild
    assert vecs.select("cell").distinct().count() == 3
    stats = spark.read.parquet(f"{path}/stats")
    assert stats.count() == 1  # history reset: one fresh build row
    assert stats.collect()[0]["phase"] == "build"
    # in-distribution append against the NEW quantizer: no staleness
    d = frame(np.array([0, 0, 1.0, 0]), 10, 300)
    rep2 = ivf_index_append(d, path)
    assert abs(rep2["staleness_drop"]) < 0.05


# --------------------------------------------------------------- HNSW


def test_hnsw_topk_recall_and_determinism(spark, sf_dir):
    """Shard-and-merge HNSW: recall@10 against the exact brute force,
    exact self-match at rank 1, and run-to-run determinism (hashed
    levels + ordered tie-breaks, no RNG anywhere)."""
    import numpy as np

    from skopje_spark.operators.hnsw import hnsw_topk
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.orderBy("vec_id").limit(3)
    got = hnsw_topk(
        e, q, k=10, shards=4, M=8, ef_construction=64, ef_search=64
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["vec_id"], r["cos_sim"]))
    # exact ground truth
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([list(r[1]) for r in rows], dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1)[:, None]
    for qid, res in by_q.items():
        assert len(res) == 10
        # queries are corpus members: rank 1 is the vector itself
        assert res[0][0] == qid and res[0][1] == 1.0
        exact = set(
            ids[np.argsort(-(V @ V[list(ids).index(qid)]))[:10]]
        )
        hit = len({v for v, _ in res} & exact)
        assert hit >= 8, (qid, hit)
    # determinism
    again = hnsw_topk(
        e, q, k=10, shards=4, M=8, ef_construction=64, ef_search=64
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_hnsw_index_build_probe_identical(spark, sf_dir, tmp_path):
    """The persisted index reloads STRUCTURALLY (no re-insertion):
    probe results are bit-identical to the one-pass build-and-search,
    and the parquet layout is shard-partitioned."""
    import os

    from skopje_spark.operators.hnsw import (
        hnsw_index_build,
        hnsw_index_probe,
        hnsw_topk,
    )
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.orderBy("vec_id").limit(2)
    path = str(tmp_path / "hnsw_idx")
    n = hnsw_index_build(e, path, shards=4, M=8, ef_construction=64)
    assert n == 4
    assert any(d.startswith("shard=") for d in os.listdir(path))
    probe = hnsw_index_probe(
        spark, path, q, k=10, ef_search=64, M=8
    ).collect()
    direct = hnsw_topk(
        e, q, k=10, shards=4, M=8, ef_construction=64, ef_search=64
    ).collect()
    assert sorted(map(tuple, probe)) == sorted(map(tuple, direct))


def test_hnsw_index_append_novel_vectors_searchable(spark, sf_dir, tmp_path):
    """Append inserts into the persisted shard graphs without a
    rebuild: a planted twin of the query lands at rank 1, only the
    touched shards rewrite, original content stays searchable, and
    duplicate ids refuse loudly."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from skopje_spark.operators.hnsw import (
        hnsw_index_append,
        hnsw_index_build,
        hnsw_index_probe,
    )
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    hnsw_index_build(e, path, shards=4, M=8, ef_construction=64)
    q = e.orderBy("vec_id").limit(1)
    before = hnsw_index_probe(spark, path, q, k=5, ef_search=64).collect()
    # plant an exact twin of the query vector under a fresh id
    twin = q.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    mtimes = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("shard=")
    }
    hnsw_index_append(twin, path, M=8, ef_construction=64)
    # dynamic partition overwrite: only the twin's shard rewrote
    untouched = [
        d for d in mtimes
        if os.path.getmtime(os.path.join(path, d)) == mtimes[d]
    ]
    assert len(untouched) == 3, untouched
    after = hnsw_index_probe(spark, path, q, k=5, ef_search=64).collect()
    got = [(r["vec_id"], r["cos_sim"]) for r in after]
    qid = q.first()["vec_id"]
    # both the original and its twin score 1.0 and lead the list
    lead = {v for v, s in got[:2]}
    assert lead == {qid, qid + 10_000_000}
    assert got[0][1] == 1.0 and got[1][1] == 1.0
    # the untouched original results are still present below
    assert {r["vec_id"] for r in before[:3]} <= {v for v, _ in got}
    # duplicate id refuses
    with _pytest.raises(Exception, match="already indexed"):
        hnsw_index_append(twin, path, M=8)


def test_hnsw_append_uses_persisted_shard_modulus(spark, tmp_path):
    """The hash MODULUS is persisted, never inferred from max(shard)+1:
    a build whose top shards received no rows must still hash appends
    with the ORIGINAL modulus, so duplicate ids land in their own
    shard and refuse."""
    import json
    import os

    import pytest as _pytest

    from skopje_spark.operators.hnsw import (
        hnsw_index_append,
        hnsw_index_build,
        hnsw_index_probe,
    )

    # 3 vectors, 8 shards: most shards empty, max(shard)+1 < 8
    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "idx")
    hnsw_index_build(e, path, shards=8, M=4, ef_construction=16)
    meta = json.load(open(os.path.join(path, "_hnsw_meta.json")))
    assert meta["shards"] == 8
    occupied = {
        int(d.split("=")[1]) for d in os.listdir(path)
        if d.startswith("shard=")
    }
    assert max(occupied) + 1 < 8  # the inference trap is real here
    # re-appending an EXISTING id must refuse (same modulus → same shard)
    with _pytest.raises(Exception, match="already indexed"):
        hnsw_index_append(e.limit(1), path, M=4)
    # novel ids append and everything stays searchable
    new = spark.createDataFrame(
        [(10, [1.0, 0.1]), (11, [0.1, 1.0])],
        "vec_id long, embedding array<double>",
    )
    hnsw_index_append(new, path, M=4, ef_construction=16)
    q = spark.createDataFrame(
        [(99, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]
        for r in hnsw_index_probe(spark, path, q, k=5, ef_search=16).collect()
    }
    assert {1, 10} <= got
