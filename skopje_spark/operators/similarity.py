"""Similarity search over embedding columns (SURVEY.md §2C D3).

Baseline: brute-force cosine — array HOFs (``zip_with`` +
``aggregate``), fully JVM-side, no UDF, no collect. Scale paths:

- **blocked pairs**: restrict the pair space with a blocking key
  (label, LSH bucket) before the join — turns O(n²) into Σ O(b²).
- **IVF top-k** (`ivf_topk`): partition vectors into coarse cells
  (here: per-label centroids computed as averages — a k-means
  assignment step at 100 TB), probe only the closest cells.
- **random-hyperplane LSH** (`rh_lsh_buckets`): sign-bit signatures
  from fixed pseudo-random hyperplanes; cosine-similar vectors share
  buckets with high probability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skopje_spark.queries.rounding import dround


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (sequential left-to-right fold —
    same accumulation order as the DuckDB oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _np_dot_udf():
    """Arrow-batched numpy dot product: the hot path for pairwise
    scoring. Interpreted HOF lambdas cost ~1 µs/element; numpy einsum
    over an Arrow batch is ~100× faster and BLAS-vectorized. Values
    can differ from the sequential fold in the last ulp (pairwise vs
    sequential summation) — results are rounded to 6 dp downstream,
    where that difference is invisible."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type annotations: this module uses postponed annotation
    # evaluation, which pandas_udf cannot introspect — the explicit
    # returnType plus bare args select the scalar pandas-UDF path
    def np_dot(a, b):
        am = np.stack(a.to_numpy()).astype("float64")
        bm = np.stack(b.to_numpy()).astype("float64")
        return pd.Series(np.einsum("ij,ij->i", am, bm))

    return pandas_udf(np_dot, "double")


def cosine_topk(
    embeddings: DataFrame,
    query_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k by cosine against a (single-row) query vector.

    The query side is broadcast; scoring is a narrow map over the
    corpus; top-k is TakeOrderedAndProject (per-partition heaps, no
    global sort). This *is* the right 100 TB plan for one query vector.
    """
    q = F.broadcast(query_df.select(F.col(vec_col).alias("__qvec")))
    scored = embeddings.crossJoin(q).select(
        F.col(id_col),
        dround(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def blocked_neardup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    The equi-join on the block key bounds the pair space; AQE splits a
    skewed block. For unblocked data, derive the key via
    :func:`rh_lsh_buckets` first.

    Execution shape (sized for scale):
    1. norms precomputed once per vector (not once per pair);
    2. the block join produces (ids, vecs) pairs, then an explicit
       repartition spreads pair scoring across all cores — the join
       itself only parallelizes over distinct block keys, which may be
       far fewer than cores (10 labels here);
    3. scoring = one Arrow-batched numpy dot per pair.
    """
    np_dot = _np_dot_udf()
    with_norm = embeddings.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        _norm(F.col(vec_col)).alias("__n"),
    )
    a = with_norm.select(
        F.col("__blk"),
        F.col("__id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = with_norm.select(
        F.col("__blk"),
        F.col("__id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    pairs = (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .repartition(F.col("id_a"), F.col("id_b"))
    )
    return (
        pairs.select(
            F.col("__blk").alias(block_col),
            "id_a",
            "id_b",
            dround(
                np_dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def rh_lsh_buckets(
    embeddings: DataFrame,
    *,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (cosine-preserving).

    Hyperplanes are fixed deterministic ±1 patterns (sign of
    sin(p·i+1) — reproducible without RNG state). The bucket id packs
    the n sign bits. Near-identical vectors collide on all bits.
    """
    bucket = None
    for p in range(n_planes):
        # deterministic ±1 pattern per plane, varying with index parity
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array([F.lit(1.0 if ((i * (p + 3) + p) % 5) < 3 else -1.0) for i in range(dim)]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.withColumn("lsh_bucket", bucket.cast("int"))


def ivf_centroids(
    embeddings: DataFrame,
    *,
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Coarse-quantizer centroids: element-wise mean per cell.

    posexplode → (cell, pos) mean → re-assemble. At 100 TB this is the
    k-means "update" step; assignment uses `cosine` against the
    (broadcast) centroid table.
    """
    exploded = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    means = exploded.groupBy("cell", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("mean_val")
    )
    return (
        means.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean_val"))
            ).alias("__pairs")
        )
        .select(
            "cell",
            F.transform(F.col("__pairs"), lambda s: s.getField("mean_val")).alias(
                "centroid"
            ),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF approximate top-k: score the query against centroids, keep
    the `n_probe` closest cells, then brute-force only those cells.

    Scale: centroid table is tiny (broadcast); the probe filter is a
    broadcast semi join → only ~n_probe/n_cells of the corpus is
    scanned for scoring.
    """
    cents = ivf_centroids(embeddings, vec_col=vec_col, cell_col=cell_col)
    q = F.broadcast(query_df.select(F.col(vec_col).alias("__qvec")))
    probe = (
        cents.crossJoin(q)
        .select("cell", cosine(F.col("centroid"), F.col("__qvec")).alias("c"))
        .orderBy(F.desc("c"))
        .limit(n_probe)
        .select("cell")
    )
    candidates = embeddings.join(
        F.broadcast(probe), embeddings[cell_col] == F.col("cell"), "left_semi"
    )
    return cosine_topk(candidates, query_df, id_col=id_col, vec_col=vec_col, k=k)
