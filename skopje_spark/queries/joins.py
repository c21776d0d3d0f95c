"""Join catalog: every join shape from SURVEY.md §2B.

Inner/left/right/full equi joins, semi/anti (the reference's
`fetch_or_insert` miss-detection, ``/root/reference/src/extract/pg.rs:67-99``),
cross, non-equi range join, and the composed as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.asof import asof_join
from skopje_spark.queries import register
from skopje_spark.queries.rounding import davg, dround
from skopje_spark.tables import load_table


@register(
    "q_join_inner_broadcast",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    tags=("join", "broadcast"),
)
def q_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join with an explicit broadcast of the dimension.

    Scale: nation is 25 rows at any SF — broadcasting removes the
    shuffle entirely (BroadcastHashJoin in the plan).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers kept even with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_right",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (mirror of left; Spark plans it as the flipped
    left join after optimization)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@register(
    "q_join_full_outer",
    oracle="""
    SELECT s_suppkey, s_name, c_custkey, c_name
    FROM supplier FULL OUTER JOIN customer ON s_suppkey = c_custkey
    """,
    tags=("join",),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join on partially-overlapping key domains (suppkey ⊂
    custkey range) — unmatched rows survive from both sides."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(c, s.s_suppkey == c.c_custkey, "full_outer").select(
        "s_suppkey", "s_name", "c_custkey", "c_name"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 5000
    )
    """,
    tags=("join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — existence check without duplication (the
    `fetch_if_exists` pattern, ``/root/reference/src/extract/pg.rs:43-65``)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 5000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the miss-detection half of the reference's
    `fetch_or_insert` upsert (``/root/reference/src/extract/pg.rs:79-94``)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, os AS o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS os FROM orders)
    """,
    tags=("join", "cross"),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny inputs (guarded: both sides bounded)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    st = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus"))
        .distinct()
    )
    return r.crossJoin(st).select("r_name", "o_orderstatus")


@register(
    "q_join_range",
    oracle="""
    SELECT s_suppkey, COUNT(c_custkey) AS n_close,
           ((CASE WHEN (SUM(c_acctbal)) < 0 THEN -(FLOOR((-(SUM(c_acctbal))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(c_acctbal)) * 100.0 + 0.5) / 100.0 END) / COUNT(c_acctbal)) AS avg_close_bal
    FROM supplier LEFT JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 50.0 AND s_acctbal + 50.0
    GROUP BY s_suppkey
    """,
    tags=("join", "range", "nonequi"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: customers within ±50 account
    balance of each supplier.

    Scale: planned as BroadcastNestedLoopJoin with supplier broadcast
    (the small side). At 100 TB one would band both sides into
    ``floor(acctbal/50)`` buckets and equi-join on adjacent buckets —
    turning O(n·m) into a co-partitioned join; noted as the scale path.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (c.c_acctbal >= s.s_acctbal - 50.0) & (c.c_acctbal <= s.s_acctbal + 50.0),
            "left",
        )
        .groupBy("s_suppkey")
        .agg(
            F.count("c_custkey").alias("n_close"),
            davg(F.col("c_acctbal"), 2).alias("avg_close_bal"),
        )
    )


@register(
    "q_join_asof",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, e.user_id, e.ts,
           r.o_orderkey  AS last_order_key,
           r.o_orderdate AS last_order_date
    FROM events e
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (event_id)
    ORDER BY event_id
    """,
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order
    at-or-before the event time (composed operator, see
    :func:`skopje_spark.operators.asof.asof_join`)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderkey"),
            F.col("o_orderdate"),
        )
    )
    out = asof_join(
        e,
        o,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        direction="backward",
        left_id=["event_id"],
        tiebreak=["o_orderkey"],
        how="left",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_orderdate").alias("last_order_date"),
    ).orderBy("event_id")


@register(
    "q_join_range_banded",
    oracle="""
    SELECT s_suppkey, COUNT(c_custkey) AS n_close,
           ((CASE WHEN (SUM(c_acctbal)) < 0 THEN -(FLOOR((-(SUM(c_acctbal))) * 100.0 + 0.5) / 100.0) ELSE FLOOR((SUM(c_acctbal)) * 100.0 + 0.5) / 100.0 END) / COUNT(c_acctbal)) AS avg_close_bal
    FROM supplier LEFT JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 50.0 AND s_acctbal + 50.0
    GROUP BY s_suppkey
    """,
    tags=("join", "range", "banded", "scale"),
)
def q_join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same ±50-balance range join as q_join_range, executed as a
    banded EQUI-join (floor(v/50) bucket key, 3-band replication) —
    hash-joinable, co-partitioned, no nested loop. Identical oracle to
    q_join_range: same result, scale-correct physical plan
    (:func:`skopje_spark.operators.rangejoin.banded_range_join`)."""
    from skopje_spark.operators.rangejoin import banded_range_join

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = banded_range_join(s, c, "s_acctbal", "c_acctbal", 50.0, how="left")
    return joined.groupBy("s_suppkey").agg(
        F.count("c_custkey").alias("n_close"),
        davg(F.col("c_acctbal"), 2).alias("avg_close_bal"),
    )


@register(
    "q_join_fuzzy_blocked",
    oracle="""
    SELECT a.p_brand,
           COUNT(*) AS n_close_pairs,
           MIN(levenshtein(a.p_name, b.p_name)) AS min_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    GROUP BY a.p_brand
    ORDER BY a.p_brand
    """,
    tags=("join", "fuzzy", "similarity"),
)
def q_join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: near-identical part names (edit
    distance ≤ 3) within a brand block — the entity-resolution shape
    (same-block candidate pairs + string-distance filter).

    Scale: the equi-key on p_brand makes this a hash join, never a
    cartesian; candidate fan-out is bounded by block size squared. At
    100 TB you'd tighten blocks further (brand × name-prefix, or a
    q-gram/LSH prefilter à la operators/dedup.py) — the plan shape
    stays the same hash-join + post-filter."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist <= 3)
        .groupBy(F.col("a.p_brand").alias("p_brand"))
        .agg(
            F.count(F.lit(1)).alias("n_close_pairs"),
            F.min(dist).alias("min_dist"),
        )
        .orderBy("p_brand")
    )


@register(
    "q_join_salted",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("join", "skew", "salted"),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py:salted_join): the fact side
    carries a random salt, the dimension side is replicated n_salts
    times, spreading any hot orderkey across 8 shuffle partitions.
    Row-level results are identical to a plain join — which is exactly
    what the oracle checks by running the UNSALTED join.

    Scale: the explicit remedy when one key is so hot that even AQE's
    skew-split partitions overwhelm a task; costs n_salts extra copies
    of the SMALL side only.
    """
    from skopje_spark.operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    j = salted_join(l, o, "l_orderkey", n_salts=8)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").cast("double").alias("total_qty"),
    )
