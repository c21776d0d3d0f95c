"""Unit tests for dataset profiling operators (operators/profile.py,
operators/text.py:frequent_ngrams) — invariants the oracle compare
can't see: null accounting, approx-vs-exact distinct agreement on
small cardinalities, and heavy-hitter ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from skopje_spark.operators.profile import profile_columns
from skopje_spark.operators.text import frequent_ngrams


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "a"), (None, "b")],
        "k int, v string",
    )
    rows = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert rows["k"]["n_rows"] == 5
    assert rows["k"]["n_null"] == 1
    assert rows["k"]["n_distinct"] == 4
    assert rows["k"]["min_value"] == "1" and rows["k"]["max_value"] == "4"
    assert rows["v"]["n_null"] == 1
    assert rows["v"]["n_distinct"] == 2
    assert rows["v"]["avg_len"] == 1.0


def test_profile_approx_path_matches_exact_on_small_cardinality(spark):
    df = spark.range(500).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("v")
    )
    exact = {r["col_name"]: r["n_distinct"] for r in profile_columns(df).collect()}
    # HLL at default rsd=0.05 is exact-ish at tiny cardinalities; the
    # contract here is "plumbing works", bounds are asserted loosely
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile_columns(df, exact_distinct=False).collect()
    }
    assert exact["k"] == 20
    assert abs(approx["k"] - 20) <= 2
    assert abs(approx["v"] - 500) <= 50


def test_frequent_ngrams_finds_planted_boilerplate(spark):
    boiler = "all rights reserved worldwide"
    rows = [(i, f"doc {i} body text number {i} " + boiler) for i in range(50)]
    rows += [(100 + i, f"unique filler {i} nothing shared here at all") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = frequent_ngrams(df, "doc_id", "text", n=3, top_k=5).collect()
    assert top[0]["ngram"] == "all rights reserved"
    assert top[0]["n_docs"] == 50
    assert top[0]["n_occ"] == 50
    # deterministic ordering: ties broken by ngram text
    keys = [(r["n_docs"], r["n_occ"], r["ngram"]) for r in top]
    assert keys == sorted(keys, key=lambda t: (-t[0], -t[1], t[2]))
