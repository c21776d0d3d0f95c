

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
