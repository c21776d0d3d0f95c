"""User-defined function surface (SURVEY §2B UDF rows — the engine
analog of the reference's row-mapping closures,
``/root/reference/src/extract/pg.rs:101-125``).

Ordering of preference at scale (the module demonstrates each tier):

1. built-in expressions (everything else in the catalog);
2. vectorized pandas UDF — Arrow batches, ~10-100× row-at-a-time;
3. grouped ``applyInPandas`` — the UDAF escape hatch;
4. Python UDTF — table-generating, one row in / many out.

Row-at-a-time ``@udf`` is deliberately absent: it is never the right
tool on this engine's hot paths.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table


def _risk_score(bal, price):
    """Vectorized account-risk toy model: log-damped price over
    shifted balance."""
    import numpy as np

    return pd.Series(np.log1p(price.to_numpy()) / (1.0 + np.abs(bal.to_numpy())))


@register(
    "q_udf_pandas_scalar",
    oracle=f"""
    SELECT c.c_custkey,
           {dround_sql("LN(1 + o.o_totalprice) / (1 + ABS(c.c_acctbal))", 6)}
             AS risk_score
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ORDER BY c.c_custkey, risk_score
    """,
    tags=("udf", "pandas", "vectorized"),
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: Arrow-batched numpy math on the executors.
    (log1p(x) == ln(1+x) to the ulp at these magnitudes; both sides
    round to 6 dp.)"""
    score = pandas_udf(_risk_score, "double")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            dround(score(F.col("c_acctbal"), F.col("o_totalprice")), 6).alias(
                "risk_score"
            ),
        )
        .orderBy("c_custkey", "risk_score")
    )


@register(
    "q_udaf_grouped_median",
    oracle="""
    SELECT c_mktsegment,
           (CASE WHEN (PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY c_acctbal)) < 0
            THEN -(FLOOR((-(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY c_acctbal))) * 10000.0 + 0.5) / 10000.0)
            ELSE FLOOR((PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY c_acctbal)) * 10000.0 + 0.5) / 10000.0 END)
             AS median_acctbal,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("udaf", "pandas", "grouped"),
)
def q_udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pandas UDAF (applyInPandas): exact per-segment median —
    a quantity Spark's built-ins only approximate (percentile_approx).

    Scale: one shuffle on the group key; each group must fit in one
    worker (segments ≪ worker memory here; at 100 TB pre-aggregate or
    t-digest instead)."""

    def seg_median(pdf: pd.DataFrame) -> pd.DataFrame:
        m = float(pdf["c_acctbal"].median())
        m = (
            -(int(-m * 1e4 + 0.5) / 1e4) if m < 0 else int(m * 1e4 + 0.5) / 1e4
        )  # dround parity
        return pd.DataFrame(
            {"c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
             "median_acctbal": [m], "n": [len(pdf)]}
        )

    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(seg_median, "c_mktsegment string, median_acctbal double, n long")
        .orderBy("c_mktsegment")
    )


@udtf(returnType="word string, word_len int")
class _WordLens:
    """UDTF: one (word, length) row per word of the input phrase."""

    def eval(self, text: str):
        for w in (text or "").split():
            yield w, len(w)


@register(
    "q_udtf_word_lens",
    oracle="""
    WITH words AS (
      SELECT r_name, UNNEST(string_split(r_name, ' ')) AS word
      FROM region
    )
    SELECT r_name, word, LENGTH(word) AS word_len
    FROM words WHERE word <> ''
    ORDER BY r_name, word
    """,
    tags=("udtf", "table-function"),
)
def q_udtf_word_lens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a LATERAL JOIN: each region name expands to
    one row per word — the table-function surface. (Demonstration
    only: explode(split()) is the built-in, codegen'd equivalent.)"""
    r = load_table(spark, sf_dir, "region")
    spark.udtf.register("word_lens", _WordLens)
    r.createOrReplaceTempView("__region_udtf_src")
    return spark.sql(
        """
        SELECT s.r_name, w.word, w.word_len
        FROM __region_udtf_src s, LATERAL word_lens(s.r_name) w
        ORDER BY s.r_name, w.word
        """
    )


@register(
    "q_udtf_polymorphic",
    oracle="""
    SELECT COUNT(*) AS rows_seen,
           ROUND(SUM(l_quantity * l_quantity), 2) AS l_quantity_sq,
           ROUND(SUM(l_discount * l_discount), 6) AS l_discount_sq
    FROM lineitem
    WHERE l_quantity < 10
    """,
    tags=("udtf", "polymorphic", "analyze"),
)
def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4): the static ``analyze`` hook
    derives the OUTPUT schema from the input struct's fields at plan
    time — one ``<field>_sq`` double column per numeric input — so
    the same function adapts to any row shape without re-registration.
    (Surface demonstration: per-row Python; the codegen'd equivalent
    for fixed schemas is a plain select of squared columns.)"""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SquareFields:
        @staticmethod
        def analyze(row: AnalyzeArgument) -> AnalyzeResult:
            out = StructType()
            for f in row.dataType.fields:
                out = out.add(f.name + "_sq", "double")
            return AnalyzeResult(out)

        def eval(self, row):
            yield tuple(float(v) * float(v) for v in row)

    spark.udtf.register("square_fields", SquareFields)
    li = load_table(spark, sf_dir, "lineitem").filter("l_quantity < 10")
    li.createOrReplaceTempView("__poly_li")
    return spark.sql("""
      SELECT COUNT(*) AS rows_seen,
             ROUND(SUM(u.l_quantity_sq), 2) AS l_quantity_sq,
             ROUND(SUM(u.l_discount_sq), 6) AS l_discount_sq
      FROM __poly_li t,
           LATERAL square_fields(struct(t.l_quantity, t.l_discount)) u
    """)
