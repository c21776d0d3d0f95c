"""Packing/chunking operator tests (operators/packing.py)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from skopje_spark.operators.packing import (
    chunk_text,
    global_prefix_sum,
    pack_concat_chunk,
)


def test_global_prefix_sum_matches_single_window(spark):
    random.seed(7)
    rows = [(i, random.randint(0, 50)) for i in random.sample(range(10000), 500)]
    df = spark.createDataFrame(rows, "id long, w long").repartition(13)

    got = global_prefix_sum(df, order_col="id", weight_col="w", out_col="off")
    naive = df.withColumn(
        "off",
        F.coalesce(
            F.sum("w").over(
                Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    assert sorted(got.collect()) == sorted(naive.collect())


def test_global_prefix_sum_empty(spark):
    df = spark.createDataFrame([], "id long, w long")
    assert global_prefix_sum(df, order_col="id", weight_col="w").count() == 0


def test_chunk_text_reconstructs_document(spark):
    docs = [
        (1, "abcdefghij" * 37),  # 370 chars
        (2, "x"),
        (3, ""),
        (4, "y" * 120),  # exactly chunk_len
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    chunks = chunk_text(df, chunk_len=120, overlap=20).collect()

    by_doc: dict[int, list] = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        parts = by_doc[doc_id]
        assert parts[0].chunk_id == 0  # even empty docs yield chunk 0
        # strip each chunk's 20-char overlap with its predecessor
        rebuilt = parts[0].chunk_text + "".join(
            p.chunk_text[20:] for p in parts[1:]
        )
        assert rebuilt == text
        # successive chunks overlap by exactly 20 chars of content
        for prev, cur in zip(parts, parts[1:]):
            assert prev.chunk_text[cur.chunk_start - prev.chunk_start:] == \
                cur.chunk_text[: len(prev.chunk_text) - (cur.chunk_start - prev.chunk_start)]


def test_pack_concat_chunk_invariants(spark):
    random.seed(11)
    rows = [(i, random.randint(1, 700)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    ctx = 256
    packed = pack_concat_chunk(df, tokens_col="n_tokens", ctx_len=ctx)
    packed.persist()

    total = sum(w for _, w in rows)
    per_seq = {
        r.seq_id: r.t
        for r in packed.groupBy("seq_id").agg(F.sum("seq_tokens").alias("t")).collect()
    }
    # sequences tile the token axis: every one full except the last
    n_seqs = -(-total // ctx)
    assert set(per_seq) == set(range(n_seqs))
    last = n_seqs - 1
    for s, t in per_seq.items():
        assert t == (ctx if s != last else total - ctx * last)

    # conservation per document: contributions sum to its token count
    per_doc = {
        r.doc_id: r.t
        for r in packed.groupBy("doc_id").agg(F.sum("seq_tokens").alias("t")).collect()
    }
    assert per_doc == dict(rows)
    packed.unpersist()


def test_pack_drops_zero_token_docs(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 5)], "doc_id long, n_tokens long"
    )
    packed = pack_concat_chunk(df, tokens_col="n_tokens", ctx_len=8)
    assert sorted(r.doc_id for r in packed.select("doc_id").distinct().collect()) == [1, 3]


def test_deterministic_shuffle_properties(spark):
    from skopje_spark.operators.packing import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = deterministic_shuffle(df, salt="s1", n_shards=4)
    b = deterministic_shuffle(df, salt="s1", n_shards=4)
    c = deterministic_shuffle(df, salt="s2", n_shards=4)

    pa = {r.doc_id: r.shuffle_pos for r in a.collect()}
    pb = {r.doc_id: r.shuffle_pos for r in b.collect()}
    pc = {r.doc_id: r.shuffle_pos for r in c.collect()}
    assert pa == pb  # reproducible
    assert pa != pc  # salt re-deals
    assert sorted(pa.values()) == list(range(500))  # a permutation

    # round-robin shards are exactly balanced
    sizes = sorted(
        r.n for r in a.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert sizes == [125, 125, 125, 125]


def test_global_prefix_sum_leaves_no_cached_state(spark):
    """The two-pass prefix sum must not leak persisted/cached RDDs into
    executor storage (it previously persisted the full frame)."""
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    df = spark.createDataFrame([(i, i % 7) for i in range(300)], "id long, w long")
    global_prefix_sum(df, order_col="id", weight_col="w").collect()
    after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    assert after - before == set()


def test_global_prefix_sum_rejects_reserved_columns(spark):
    import pytest

    df = spark.createDataFrame([(1, 2, 3)], "id long, w long, __pid int")
    with pytest.raises(ValueError, match="__pid"):
        global_prefix_sum(df, order_col="id", weight_col="w")


def test_global_prefix_sum_string_order_key(spark):
    """String order keys (the deterministic-shuffle path) bucket and
    sum identically to the single-task window."""
    rows = [(f"{(i * 37) % 101:03d}-{i}", 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, w long").repartition(7)
    got = global_prefix_sum(df, order_col="k", weight_col="w", out_col="off")
    naive = df.withColumn(
        "off",
        F.coalesce(
            F.sum("w").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    assert sorted(got.collect()) == sorted(naive.collect())


def test_global_prefix_sum_composite_order_key(spark):
    """Multi-column (value, id) order: exclusive prefix sum matches the
    single-task window with the same lexicographic ordering."""
    import random as _r

    _r.seed(3)
    rows = [(i, _r.randint(0, 9), _r.randint(1, 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long, w long").repartition(9)
    got = global_prefix_sum(df, order_col=["v", "id"], weight_col="w", out_col="off")
    naive = df.withColumn(
        "off",
        F.coalesce(
            F.sum("w").over(
                Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    assert sorted(got.collect()) == sorted(naive.collect())


def test_equidepth_histogram_matches_ntile(spark):
    """Bucket sizes differ by at most 1, tile the whole input, and
    agree with the single-task NTILE reference."""
    import random as _r

    from skopje_spark.operators.stats import equidepth_histogram

    _r.seed(9)
    rows = [(i, _r.randint(0, 50)) for i in range(203)]
    df = spark.createDataFrame(rows, "doc_id long, text_len long")
    got = equidepth_histogram(df, "text_len", "doc_id", n_buckets=8).collect()
    sizes = [r["n_rows"] for r in sorted(got, key=lambda r: r["bucket"])]
    assert sum(sizes) == 203
    assert max(sizes) - min(sizes) <= 1
    ref = (
        df.withColumn("b", F.ntile(8).over(Window.orderBy("text_len", "doc_id")))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"), F.min("text_len").alias("mn"),
             F.max("text_len").alias("mx"))
        .collect()
    )
    ref_by = {r["b"] - 1: (r["n"], r["mn"], r["mx"]) for r in ref}
    got_by = {r["bucket"]: (r["n_rows"], r["min_text_len"], r["max_text_len"])
              for r in got}
    assert got_by == ref_by


def test_weighted_sample_deterministic_and_weight_monotone(spark):
    """Same input -> same sample; heavier rows are sampled more often
    (aggregate check over disjoint weight tiers)."""
    from skopje_spark.operators.sampling import weighted_sample

    rows = [(i, 100 if i % 10 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 80).collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", 80).collect())
    assert a == b  # reproducible
    heavy = sum(1 for i in a if i % 10 == 0)
    # 100 heavy rows with 100x weight: expect they dominate the sample
    assert heavy >= 50
    # zero/negative weights never selected
    df2 = spark.createDataFrame([(1, 0), (2, -3), (3, 5)], "id long, w long")
    assert [r["id"] for r in weighted_sample(df2, "id", "w", 10).collect()] == [3]


def test_global_prefix_sum_all_null_order_key(spark):
    """Every order key null: the bound sampler finds nothing to cut on
    and falls back to a single bucket instead of IndexError; nulls sort
    first so the sum is still a valid running total."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.packing import global_prefix_sum

    df = spark.createDataFrame(
        [(i, 2) for i in range(20)], "id long, w long"
    ).withColumn("k", F.lit(None).cast("long"))
    out = global_prefix_sum(df, order_col="k", weight_col="w", out_col="cum")
    sums = sorted(r["cum"] for r in out.collect())
    assert sums == [2 * i for i in range(20)]  # exclusive running offset
