"""Units for blocked fuzzy matching and reciprocal rank fusion
(operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from skopje_spark.operators.linkage import fuzzy_pairs_blocked, rrf_fuse


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id int, name string")


def test_fuzzy_finds_in_block_matches(spark):
    left = _mk(spark, [(1, "aaxbb")])
    right = _mk(spark, [(10, "aaybb"), (11, "aazzz"), (12, "aabbb")])
    out = fuzzy_pairs_blocked(
        left, right,
        left_id="id", right_id="id",
        left_text="name", right_text="name",
        block=F.substring("name", 1, 2), max_dist=1,
    ).collect()
    got = {(r["left_id"], r["right_id"], r["edit_dist"]) for r in out}
    # aaybb: 1 substitution; aabbb: x->b is 1 sub; aazzz: distance 3 dropped
    assert got == {(1, 10, 1), (1, 12, 1)}


def test_fuzzy_never_crosses_blocks(spark):
    """A true match in a different block is invisible — the blocking
    contract (recall = the key's recall)."""
    left = _mk(spark, [(1, "abcde")])
    right = _mk(spark, [(2, "zbcde")])  # distance 1 but blocks differ
    out = fuzzy_pairs_blocked(
        left, right,
        left_id="id", right_id="id",
        left_text="name", right_text="name",
        block=F.substring("name", 1, 1), max_dist=2,
    )
    assert out.count() == 0


def test_fuzzy_distance_cap(spark):
    left = _mk(spark, [(1, "aaaaaa")])
    right = _mk(spark, [(2, "aaaaab"), (3, "aaabbb")])
    out = fuzzy_pairs_blocked(
        left, right,
        left_id="id", right_id="id",
        left_text="name", right_text="name",
        block=F.substring("name", 1, 3), max_dist=2,
    ).collect()
    assert {(r["right_id"], r["edit_dist"]) for r in out} == {(2, 1)}


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, score double")


def test_rrf_doc_in_both_lists_beats_single_list_leaders(spark):
    a = _ranked(spark, [(1, 0.9), (2, 0.8), (3, 0.7)])
    b = _ranked(spark, [(9, 0.99), (3, 0.5), (8, 0.4)])
    out = rrf_fuse([a, b], id_col="doc_id", top_k=5).collect()
    # doc 3: 1/63 + 1/62 > any single-list rank-1 (1/61)
    assert out[0]["doc_id"] == 3 and out[0]["n_lists"] == 2
    assert {r["doc_id"] for r in out} == {1, 2, 3, 8, 9}


def test_rrf_rank_values(spark):
    a = _ranked(spark, [(1, 0.9)])
    b = _ranked(spark, [(1, 0.1)])
    r = rrf_fuse([a, b], id_col="doc_id").collect()[0]
    assert abs(r["rrf_score"] - round(2 / 61, 6)) < 1e-9


def test_rrf_ties_break_by_id(spark):
    a = _ranked(spark, [(5, 0.5), (3, 0.5)])
    out = rrf_fuse([a], id_col="doc_id").collect()
    # equal scores: lower id gets rank 1
    assert out[0]["doc_id"] == 3 and out[0]["rrf_score"] > out[1]["rrf_score"]


def test_sorted_neighborhood_equals_naive_global_window(spark):
    """The bucketed implementation (range buckets + boundary stitch)
    must produce exactly the pairs of a naive global-order lead chain."""
    from pyspark.sql import Window

    from skopje_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [(i, f"name{(i * 37) % 100:03d}x{i}") for i in range(211)]
    df = spark.createDataFrame(rows, "id int, name string")
    w = 3
    got = {
        (r["left_id"], r["right_id"])
        for r in sorted_neighborhood_pairs(
            df, id_col="id", text_col="name", sort_key="name", window=w
        ).collect()
    }
    # naive reference: single-task global window (fine at test size)
    order = Window.orderBy("name", "id")
    naive = set()
    for k in range(1, w + 1):
        naive |= {
            (r["l"], r["r"])
            for r in df.select(
                F.col("id").alias("l"),
                F.lead("id", k).over(order).alias("r"),
            ).filter(F.col("r").isNotNull()).collect()
        }
    assert got == naive
    assert len(got) == 211 * w - w * (w + 1) // 2


def test_sorted_neighborhood_undersized_buckets_merge(spark):
    """With n_buckets ~ row count, range buckets hold fewer rows than
    the window; without the merge pass, neighbors two buckets away are
    silently lost. The merged buckets must still equal the naive
    global-window pair set exactly."""
    from pyspark.sql import Window

    from skopje_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [(i, f"name{(i * 37) % 100:03d}x{i}") for i in range(23)]
    df = spark.createDataFrame(rows, "id int, name string")
    w = 5
    got = {
        (r["left_id"], r["right_id"])
        for r in sorted_neighborhood_pairs(
            df, id_col="id", text_col="name", sort_key="name",
            window=w, n_buckets=16,  # ~1-2 rows per bucket, all < window
        ).collect()
    }
    order = Window.orderBy("name", "id")
    naive = set()
    for k in range(1, w + 1):
        naive |= {
            (r["l"], r["r"])
            for r in df.select(
                F.col("id").alias("l"),
                F.lead("id", k).over(order).alias("r"),
            ).filter(F.col("r").isNotNull()).collect()
        }
    assert got == naive


def test_sorted_neighborhood_verifies_distance(spark):
    from skopje_spark.operators.linkage import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alphb"), (3, "omega")], "id int, name string"
    )
    out = sorted_neighborhood_pairs(
        df, id_col="id", text_col="name", sort_key="name", window=2, max_dist=1
    ).collect()
    assert {(r["left_id"], r["right_id"], r["edit_dist"]) for r in out} == {
        (1, 2, 1)
    }


def test_bm25_normalizes_query_terms_and_rejects_empty(spark):
    import pytest as _pytest

    from skopje_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [(1, "paris is large"), (2, "london is larger")], "doc_id int, text string"
    )
    # capitalized query must match lowercased corpus tokens
    up = {r["doc_id"] for r in bm25_scores(df, ["Paris"]).collect()}
    lo = {r["doc_id"] for r in bm25_scores(df, ["paris"]).collect()}
    assert up == lo == {1}
    with _pytest.raises(ValueError, match="no usable query terms"):
        bm25_scores(df, [])
    with _pytest.raises(ValueError, match="no usable query terms"):
        bm25_scores(df, ["123", "!!"])
