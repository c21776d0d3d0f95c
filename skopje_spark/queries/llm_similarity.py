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
    ivf_topk,
    rh_lsh_buckets,
)
from skopje_spark.queries import register
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
