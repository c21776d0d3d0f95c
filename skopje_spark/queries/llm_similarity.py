"""Similarity-search queries over the embeddings fixture (§2C D3).

Double-precision everywhere: both engines cast the float32 vectors to
double and fold left-to-right, so cosines agree to ~1e-15 and 6-dp
rounding is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.similarity import (
    blocked_neardup_pairs,
    cosine_topk,
    ivf_centroids,
    ivf_topk,
    l2_norm,
    l2_normalize,
    rh_lsh_buckets,
)
from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround
from skopje_spark.tables import load_table


@register(
    "q_similarity_topk_bruteforce",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings ORDER BY vec_id LIMIT 1
    )
    SELECT vec_id,
           (CASE WHEN (list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) < 0 THEN -(FLOOR((-(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) * 1000000.0 + 0.5) / 1000000.0 END) AS cos_sim
    FROM embeddings, q
    ORDER BY (CASE WHEN (list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) < 0 THEN -(FLOOR((-(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) * 1000000.0 + 0.5) / 1000000.0 END) DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity", "topk", "bruteforce"),
)
def q_similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the min-vec_id query vector.

    Scale: broadcast query + narrow scoring map + per-partition top-k
    heaps (TakeOrderedAndProject) — no global sort, no crossJoin blowup.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.orderBy("vec_id").limit(1)
    return cosine_topk(e, q, id_col="vec_id", vec_col="embedding", k=10)


@register(
    "q_similarity_blocked_pairs",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           (CASE WHEN (list_cosine_similarity(a.v, b.v)) < 0 THEN -(FLOOR((-(list_cosine_similarity(a.v, b.v))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((list_cosine_similarity(a.v, b.v)) * 1000000.0 + 0.5) / 1000000.0 END) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE (CASE WHEN (list_cosine_similarity(a.v, b.v)) < 0 THEN -(FLOOR((-(list_cosine_similarity(a.v, b.v))) * 1000000.0 + 0.5) / 1000000.0) ELSE FLOOR((list_cosine_similarity(a.v, b.v)) * 1000000.0 + 0.5) / 1000000.0 END) >= 0.35
    """,
    tags=("similarity", "pairs", "blocked"),
)
def q_similarity_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs blocked by label (cos ≥ 0.35).

    Scale: the label equi-join bounds the pair space to Σ|block|²;
    unlabeled corpora derive the block from LSH buckets instead.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return blocked_neardup_pairs(
        e, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.35
    )


@register("q_similarity_ivf_topk", oracle=None, tags=("similarity", "ivf", "ann"))
def q_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: probe the 3 closest label-cells by
    centroid, brute-force only those cells (~30% of the corpus).

    No oracle: the probe set depends on engine-internal tie handling
    in centroid ranking; correctness is covered by a unit test checking
    the result equals the exact top-k restricted to the probed cells.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.orderBy("vec_id").limit(1)
    return ivf_topk(
        e, q, id_col="vec_id", vec_col="embedding", cell_col="label", n_probe=3, k=10
    )


@register("q_similarity_ivf_kmeans", oracle=None, tags=("similarity", "ivf", "kmeans", "ann"))
def q_similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 over a true k-means coarse quantizer (3 Lloyd
    rounds, 8 cells, deterministic seeds) instead of label-as-cell:
    cells follow vector geometry, so 3 probed cells capture most real
    neighbors (recall floor asserted in tests/test_operators.py).

    No oracle: the quantizer is iterative (not SQL-expressible);
    rows-only here, quantitative recall-vs-bruteforce in the unit
    suite.
    """
    from skopje_spark.operators.similarity import kmeans_cells

    e = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_cells(e, id_col="vec_id", vec_col="embedding", k=8, iters=3)
    q = assigned.orderBy("vec_id").limit(1)
    return ivf_topk(
        assigned, q, id_col="vec_id", vec_col="embedding", cell_col="cell",
        n_probe=3, k=10,
    )


@register("q_similarity_lsh_buckets", oracle=None, tags=("similarity", "lsh"))
def q_similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket histogram (8 planes → 256 buckets).

    Rows-only check: bucket ids are engine-deterministic (fixed ±1
    hyperplanes) but depend on double-summation over 64 floats right
    at the sign boundary for some vectors, so cross-engine hash parity
    is not guaranteed; unit tests assert the Spark-side invariants.
    """
    e = load_table(spark, sf_dir, "embeddings")
    b = rh_lsh_buckets(e, vec_col="embedding", n_planes=8, dim=64)
    return (
        b.groupBy("lsh_bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("lsh_bucket")
    )


@register(
    "q_embed_normalize",
    oracle="""
    SELECT vec_id,
           (CASE WHEN (sqrt(nsq)) < 0 THEN -(FLOOR((-(sqrt(nsq))) * 1000000.0 + 0.5) / 1000000.0)
                 ELSE FLOOR((sqrt(nsq)) * 1000000.0 + 0.5) / 1000000.0 END) AS norm,
           (CASE WHEN (CAST(embedding[1] AS DOUBLE) / sqrt(nsq)) < 0
                 THEN -(FLOOR((-(CAST(embedding[1] AS DOUBLE) / sqrt(nsq))) * 10000.0 + 0.5) / 10000.0)
                 ELSE FLOOR((CAST(embedding[1] AS DOUBLE) / sqrt(nsq)) * 10000.0 + 0.5) / 10000.0 END) AS unit_first,
           (CASE WHEN (posdig / sqrt(nsq)) < 0
                 THEN -(FLOOR((-(posdig / sqrt(nsq))) * 10000.0 + 0.5) / 10000.0)
                 ELSE FLOOR((posdig / sqrt(nsq)) * 10000.0 + 0.5) / 10000.0 END) AS unit_posdigest
    FROM (
      SELECT vec_id, embedding,
             list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nsq,
             list_sum(list_transform(range(1, len(embedding) + 1),
                      i -> CAST(embedding[i] AS DOUBLE) * i)) AS posdig
      FROM embeddings
    )
    ORDER BY vec_id
    """,
    tags=("embedding", "similarity", "llm-pipeline"),
)
def q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization (operators/similarity.py:l2_normalize): unit
    vectors + lengths, projected to order-sensitive scalar digests
    (first element + position-weighted sum Σ unit[i]·i — any element
    swap or scale error changes the digest) so the cross-engine hash
    compares scalars. Element-wise HOF map in codegen — zero shuffle;
    after this step cosine reduces to a plain dot product."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    unit = l2_normalize(emb)
    posdigest = F.aggregate(
        F.zip_with(
            unit,
            F.sequence(F.lit(1), F.size(emb)),
            lambda x, i: x * i.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        dround(l2_norm(emb), 6).alias("norm"),
        dround(F.element_at(unit, 1), 4).alias("unit_first"),
        dround(posdigest, 4).alias("unit_posdigest"),
    ).orderBy("vec_id")


@register(
    "q_embed_centroids",
    oracle="""
    WITH px AS (
      SELECT label, i, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    m AS (
      SELECT label, i, AVG(val) AS mean_val FROM px GROUP BY label, i
    )
    SELECT label,
           COUNT(*) AS n_dims,
           (CASE WHEN (SUM(CASE WHEN i = 1 THEN mean_val END)) < 0
                 THEN -(FLOOR((-(SUM(CASE WHEN i = 1 THEN mean_val END))) * 10000.0 + 0.5) / 10000.0)
                 ELSE FLOOR((SUM(CASE WHEN i = 1 THEN mean_val END)) * 10000.0 + 0.5) / 10000.0 END) AS c_first,
           (CASE WHEN (SUM(mean_val * i)) < 0
                 THEN -(FLOOR((-(SUM(mean_val * i))) * 10000.0 + 0.5) / 10000.0)
                 ELSE FLOOR((SUM(mean_val * i)) * 10000.0 + 0.5) / 10000.0 END) AS c_posdigest
    FROM m GROUP BY label ORDER BY label
    """,
    tags=("embedding", "similarity", "llm-pipeline"),
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity.py:
    ivf_centroids — the IVF coarse-quantizer / k-means update step),
    digested to scalars (dim count, first element, position-weighted
    sum) for the cross-engine hash. posexplode → (cell, pos) mean →
    ordered re-assembly; shuffle keys are (label, pos), so the job
    scales with dim × n_labels, not corpus size.

    DuckDB's AVG and Spark's avg may differ in the last ulp (different
    summation trees over 500 floats), hence 4-dp digests."""
    e = load_table(spark, sf_dir, "embeddings")
    c = ivf_centroids(e, vec_col="embedding", cell_col="label")
    cent = F.col("centroid")
    posdigest = F.aggregate(
        F.zip_with(
            cent,
            F.sequence(F.lit(1), F.size(cent)),
            lambda x, i: x * i.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        c.select(
            F.col("cell").alias("label"),
            F.size(cent).cast("bigint").alias("n_dims"),
            dround(F.element_at(cent, 1), 4).alias("c_first"),
            dround(posdigest, 4).alias("c_posdigest"),
        )
        .orderBy("label")
    )
