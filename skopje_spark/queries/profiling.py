"""Corpus profiling queries: dataset-card column statistics and
boilerplate (frequent n-gram) detection.

The reference moves tables whole (`/root/reference/src/etl.rs:14-28`)
and never inspects content; these queries add the intake-side
profiling passes a 100 TB corpus needs before any curation decision:
what's in each column, and which templated text dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.profile import profile_columns, profile_columns_sql
from skopje_spark.operators.text import frequent_ngrams
from skopje_spark.queries import register
from skopje_spark.tables import load_table

_DOC_COLS = ["doc_id", "lang", "n_chars", "source", "text"]


@register(
    "q_profile_columns",
    oracle=profile_columns_sql("documents", _DOC_COLS),
    tags=("profile", "stats", "llm-pipeline"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset-card profile of every documents column: null
    rate, exact distinct count, native-typed min/max (cast to string
    after the aggregate), mean value width
    (operators/profile.py:profile_columns). Single agg + one-row
    reshape; the oracle is GENERATED from the same column list, so the
    two sides agree by construction."""
    d = load_table(spark, sf_dir, "documents")
    return profile_columns(d, _DOC_COLS)


@register(
    "q_ngram_boilerplate",
    oracle="""
    WITH tokarr AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ts
      FROM documents
    ),
    sh AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ngram
      FROM tokarr,
           UNNEST(CASE WHEN len(ts) >= 3 THEN range(1, len(ts) - 1) ELSE [] END) AS u(i)
    )
    SELECT ngram,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occ
    FROM sh
    GROUP BY ngram
    ORDER BY n_docs DESC, n_occ DESC, ngram
    LIMIT 20
    """,
    tags=("profile", "text", "boilerplate", "llm-pipeline"),
)
def q_ngram_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word 3-grams by document frequency — the boilerplate /
    template detector (operators/text.py:frequent_ngrams). Map-side
    partial agg on the gram, TakeOrderedAndProject top-k; the cut is a
    total order (n_docs, n_occ, ngram) so both engines pick the
    identical 20 rows."""
    d = load_table(spark, sf_dir, "documents")
    return frequent_ngrams(d, "doc_id", "text", n=3, top_k=20)


@register(
    "q_table_digest",
    oracle=r"""
    WITH rowed AS (
      SELECT
        ('0x' || substr(sha256(concat_ws(chr(31),
            COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)))), 1, 15))::BIGINT % 64 AS bucket,
        sha256(concat_ws(chr(31),
            COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)),
            COALESCE(CAST(o_custkey AS VARCHAR), chr(0)),
            COALESCE(o_orderstatus, chr(0)),
            COALESCE(o_orderpriority, chr(0)),
            COALESCE(CAST(o_orderdate AS VARCHAR), chr(0)))) AS rh
      FROM orders
    )
    SELECT bucket,
           COUNT(*) AS n_rows,
           sha256(string_agg(rh, '' ORDER BY rh)) AS digest
    FROM rowed
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("quality", "digest", "anti-entropy", "lake"),
)
def q_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style bucketed fingerprints of the orders table
    (operators/quality.py:table_digest): 64 buckets keyed by a
    sha-derived hash of o_orderkey, each carrying an order-independent
    sha256 digest of its rows — the anti-entropy primitive for
    validating replicas/migrations by comparing O(64) rows instead of
    re-scanning either side. The oracle re-derives every digest in
    DuckDB, proving the fingerprints are ENGINE-portable: a replica
    validated by a different engine entirely still agrees bucket for
    bucket."""
    from skopje_spark.operators.quality import table_digest

    o = load_table(spark, sf_dir, "orders")
    return table_digest(
        o,
        ["o_orderkey"],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
        n_buckets=64,
    ).orderBy("bucket")


@register(
    "q_dq_k_anonymity",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS group_size
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    HAVING COUNT(*) < 10
    ORDER BY c_mktsegment, c_nationkey
    """,
    tags=("quality", "privacy", "k-anonymity"),
)
def q_dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity screen (operators/quality.py:check_k_anonymity):
    customer quasi-identifier combos (market segment × nation) held
    by fewer than k=10 customers — each is a re-identification risk
    the release pipeline must generalize or suppress. One map-side-
    combined groupBy; output ∝ violations."""
    from skopje_spark.operators.quality import check_k_anonymity

    c = load_table(spark, sf_dir, "customer")
    return check_k_anonymity(c, ["c_mktsegment", "c_nationkey"], k=10).orderBy(
        "c_mktsegment", "c_nationkey"
    )


@register(
    "q_dq_l_diversity",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS group_size,
           COUNT(DISTINCT o_orderstatus) AS n_sensitive
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderstatus) < 3
    ORDER BY o_custkey
    """,
    tags=("quality", "privacy", "l-diversity"),
)
def q_dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity screen (operators/quality.py:check_l_diversity):
    groups — here per-customer order histories — whose sensitive
    attribute (order status) takes fewer than l=3 distinct values.
    The refinement k-anonymity misses: a large group still leaks the
    sensitive value when everyone in it shares one. One groupBy,
    output ∝ violations."""
    from skopje_spark.operators.quality import check_l_diversity

    o = load_table(spark, sf_dir, "orders")
    return check_l_diversity(o, ["o_custkey"], "o_orderstatus", l=3).orderBy(
        "o_custkey"
    )


@register(
    "q_digest_replica_drift",
    oracle=r"""
    WITH rowed AS (
      SELECT o_orderkey,
        ('0x' || substr(sha256(concat_ws(chr(31),
            COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)))), 1, 15))::BIGINT % 64 AS bucket,
        sha256(concat_ws(chr(31),
            COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)),
            COALESCE(CAST(o_custkey AS VARCHAR), chr(0)),
            COALESCE(o_orderstatus, chr(0)),
            COALESCE(CAST(o_orderdate AS VARCHAR), chr(0)))) AS rh
      FROM orders
    ),
    da AS (
      SELECT bucket, COUNT(*) AS n_rows_a,
             sha256(string_agg(rh, '' ORDER BY rh)) AS d
      FROM rowed GROUP BY bucket
    ),
    db AS (
      SELECT bucket, COUNT(*) AS n_rows_b,
             sha256(string_agg(rh, '' ORDER BY rh)) AS d
      FROM rowed WHERE o_orderkey % 997 <> 0 GROUP BY bucket
    )
    SELECT COALESCE(da.bucket, db.bucket) AS bucket,
           COALESCE(da.n_rows_a, 0) AS n_rows_a,
           COALESCE(db.n_rows_b, 0) AS n_rows_b,
           CAST(da.d IS NOT DISTINCT FROM db.d
                AND COALESCE(da.n_rows_a, 0) IS NOT DISTINCT FROM COALESCE(db.n_rows_b, 0)
                AS INTEGER) AS match
    FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
    ORDER BY bucket
    """,
    tags=("quality", "digest", "anti-entropy", "replication"),
)
def q_digest_replica_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end anti-entropy run
    (operators/quality.py:table_digest + digest_compare): the orders
    table vs a drifted replica (every 997th order key silently lost),
    compared digest-by-digest. Only the buckets holding lost keys
    flip to match=0 — those name the key ranges to re-sync; the rest
    prove untouched WITHOUT re-reading either side. Both engines
    re-derive both fingerprint sets, so the query also proves the
    comparison itself is engine-portable."""
    from skopje_spark.operators.quality import digest_compare, table_digest

    o = load_table(spark, sf_dir, "orders")
    replica = o.filter(F.pmod(F.col("o_orderkey"), F.lit(997)) != 0)
    keys = ["o_orderkey"]
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
    da = table_digest(o, keys, cols, n_buckets=64)
    db = table_digest(replica, keys, cols, n_buckets=64)
    return digest_compare(da, db).orderBy("bucket")


@register(
    "q_digest_incremental",
    oracle=r"""
    SELECT
      ('0x' || substr(sha256(concat_ws(chr(31),
          COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)))), 1, 15))::BIGINT % 32 AS bucket,
      COUNT(*) AS n_rows,
      CAST(1 AS INTEGER) AS ivm_matches_fresh
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("quality", "digest", "incremental", "ivm"),
)
def q_digest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental digest maintenance behind the correctness gate
    (operators/quality.py:table_digest_update): the orders table
    arrives as two loads; the bounded-state digest of load 1 is
    folded forward with load 2's rows as a changelog, and the verdict
    asserts the incrementally-maintained digest equals the
    recomputed-from-scratch digest in EVERY bucket — counts, sums,
    and xors. The oracle re-derives the per-bucket row counts, so the
    hash pins real bucket occupancy alongside the IVM verdict."""
    from skopje_spark.operators.quality import table_digest, table_digest_update

    o = load_table(spark, sf_dir, "orders")
    keys = ["o_orderkey"]
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
    nb = 32
    first = o.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0)
    second = o.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1)

    ivm = table_digest_update(
        table_digest(first, keys, cols, n_buckets=nb, exact=False),
        second,
        second.limit(0),
        keys,
        cols,
        n_buckets=nb,
    )
    fresh = table_digest(o, keys, cols, n_buckets=nb, exact=False)
    j = fresh.alias("f").join(ivm.alias("i"), "bucket", "left")
    return (
        j.select(
            "bucket",
            F.col("f.n_rows").alias("n_rows"),
            (
                F.col("f.n_rows").eqNullSafe(F.col("i.n_rows"))
                & F.col("f.digest_sum").eqNullSafe(F.col("i.digest_sum"))
                & F.col("f.digest_xor").eqNullSafe(F.col("i.digest_xor"))
            )
            .cast("int")
            .alias("ivm_matches_fresh"),
        )
        .orderBy("bucket")
    )
