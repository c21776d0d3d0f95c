"""Record linkage: blocked fuzzy matching and rank fusion.

Entity resolution at 100 TB never compares all pairs — the standard
shape (Fellegi–Sunter blocking, every dedup/linkage system since) is:

1. **candidate generation** by an equi-join on a cheap BLOCKING key
   (phonetic code, prefix, sorted-neighborhood window) — one shuffle,
   candidates ∝ Σ|block_L|·|block_R|, bounded by the key's design;
2. **verification** of candidates with an expensive measure (edit
   distance here) — JVM-codegen `levenshtein` with an early-exit
   threshold, never a Python UDF.

Recall is exactly the blocking key's recall (a true match split
across blocks is never scored) — that tradeoff is the operator's
contract and the knob the user owns.

:func:`rrf_fuse` is the retrieval-side composition tool: reciprocal
rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) combines
top-k lists from different scorers (BM25 lexical, embedding cosine)
without score calibration — only ranks matter:

    rrf(d) = Σ_lists 1 / (c + rank_list(d)),  c = 60
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_pairs_blocked(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    block: Column | str,
    max_dist: int = 2,
) -> DataFrame:
    """Candidate pairs within shared blocks whose edit distance is at
    most ``max_dist``: columns ``left_id``, ``right_id``,
    ``edit_dist``.

    ``block`` is a Column expression evaluated against EACH side's
    text column (pass a function of the column name, e.g.
    ``F.substring("name", 10, 8)`` works when both sides share the
    column name; otherwise pre-compute a ``__blk`` column).

    Plan: equi-join on the block key (one shuffle each side, AQE
    skew-split if a block is hot), then `levenshtein(l, r, threshold)`
    — Spark's threshold form abandons a pair as soon as the running
    distance exceeds the cap, so verification cost tracks the cap,
    not string length. No UDF; whole-stage codegen end-to-end.
    """
    lb = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_text).alias("__ls"),
        (F.col(block) if isinstance(block, str) else block).alias("__blk"),
    )
    rb = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_text).alias("__rs"),
        (F.col(block) if isinstance(block, str) else block).alias("__blk"),
    )
    dist = F.levenshtein(F.col("__ls"), F.col("__rs"), max_dist)
    return (
        lb.join(rb, "__blk")
        .select(
            F.col("__lid").alias("left_id"),
            F.col("__rid").alias("right_id"),
            dist.alias("edit_dist"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_dist))
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    *,
    id_col: str,
    score_col: str = "score",
    c: float = 60.0,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank-fuse top-k lists: each input frame carries
    (``id_col``, ``score_col``); ranks are assigned here under the
    deterministic total order (score desc, id asc) — producers must
    pre-round scores (bm25_scores / cosine_topk already do), so both
    engines rank identically. Output: (id, ``rrf_score``, ``n_lists``)
    ordered by (rrf desc, id), limited to ``top_k``.

    The per-list rank window is unpartitioned BY DESIGN: inputs are
    already top-k shortlists (tens of rows), so the single-task sort
    is over k rows, not the corpus — the corpus-sized work happened
    inside each retriever.
    """
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    parts = [
        df.select(id_col, score_col)
        .withColumn("__r", F.row_number().over(w))
        .select(
            id_col,
            (F.lit(1.0) / (F.lit(float(c)) + F.col("__r"))).alias("__contrib"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    from skopje_spark.queries.rounding import dround

    return (
        u.groupBy(id_col)
        .agg(
            dround(F.sum("__contrib"), 6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(top_k)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    sort_key: Column | str,
    window: int = 3,
    max_dist: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo,
    SIGMOD 1995) — the OTHER classic blocking scheme: order records by
    a sort key and pair each record with its next ``window`` neighbors
    in that order. Where equality blocking misses matches that differ
    in the block key's characters, neighborhood blocking catches any
    pair the sort key places near each other — the two schemes are
    complementary and real pipelines union several passes with
    different keys.

    Returns ``left_id``/``right_id``/``edit_dist`` like
    :func:`fuzzy_pairs_blocked` (``edit_dist`` only when ``max_dist``
    is given — pure candidate generation otherwise, with -1 in the
    column). Candidate count is exactly n·window minus the tail — the
    knob is explicit.

    Scale — deliberately NOT ``Window.orderBy`` without partitioning
    (that is a single-task global sort, the classic scale-killer):
    rows hash into RANGE buckets by literal bounds sampled once on
    the driver (same two-pass pattern as packing.pack_sequences, so
    every pass agrees on the same bucket for the same row), buckets
    are re-indexed densely, and

    - IN-BUCKET neighbors come from one per-bucket window pass
      (lead 1..w gathered into an array, then exploded);
    - CROSS-BOUNDARY neighbors come from stitching each bucket's last
      w rows to the next bucket's first w rows — ≤ w(w+1)/2 extra
      pairs per boundary, a per-bucket-constant frame.

    Total: one sampled scan for bounds, one shuffle into buckets, and
    windows that never exceed a bucket."""
    from pyspark.sql import Window

    from skopje_spark.operators.packing import _bucket_of, _range_bucket_bounds

    sk = F.col(sort_key) if isinstance(sort_key, str) else sort_key
    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s"), sk.alias("__sk")
    )
    w = int(window)
    if n_buckets is None:
        n_buckets = max(1, base.rdd.getNumPartitions())
    bounds = _range_bucket_bounds(base, ["__sk", "__id"], n_buckets)
    b = base.withColumn(
        "__b", _bucket_of([F.col("__sk"), F.col("__id")], bounds)
    )
    # dense re-index: a bucket left empty by sampling skew would break
    # physical adjacency, so adjacency runs over ranks of NON-EMPTY
    # bucket ids (a tiny broadcast map)
    ranks = (
        b.select("__b").distinct()
        .withColumn("__db", F.row_number().over(Window.orderBy("__b")) - 1)
    )
    b = b.join(F.broadcast(ranks), "__b").drop("__b")

    # minimum-size invariant: the boundary stitch below only spans
    # ADJACENT buckets (d, d+1), which is complete iff every bucket
    # holds >= window rows — a pair within window steps in global
    # order then cannot skip over a whole bucket. Sampling skew (or
    # n_buckets ~ row count) can leave shorter buckets, silently
    # losing candidates, so undersized CONSECUTIVE buckets are merged
    # driver-side (O(n_buckets) counts, a tiny broadcast remap) until
    # the invariant holds; a trailing short group folds backward.
    sizes = {
        r["__db"]: r["n"]
        for r in b.groupBy("__db").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if sizes and min(sizes.values()) < w and len(sizes) > 1:
        remap: dict[int, int] = {}
        cur, acc = 0, 0
        for db in sorted(sizes):
            remap[db] = cur
            acc += sizes[db]
            if acc >= w:
                cur, acc = cur + 1, 0
        if acc and cur > 0:  # trailing group still undersized
            remap = {db: min(g, cur - 1) for db, g in remap.items()}
        mdf = df.sparkSession.createDataFrame(
            [(int(db), int(g)) for db, g in remap.items()], "__db int, __mb int"
        )
        b = (
            b.join(F.broadcast(mdf), "__db")
            .drop("__db")
            .withColumnRenamed("__mb", "__db")
        )

    order = Window.partitionBy("__db").orderBy("__sk", "__id")
    with_leads = b.select(
        "__db",
        F.col("__id"),
        F.col("__s"),
        F.array(
            *[
                F.struct(
                    F.lead("__id", k).over(order).alias("rid"),
                    F.lead("__s", k).over(order).alias("rs"),
                )
                for k in range(1, w + 1)
            ]
        ).alias("__nbrs"),
        F.row_number().over(order).alias("__pos"),
        F.count(F.lit(1)).over(Window.partitionBy("__db")).alias("__n"),
    )
    in_pairs = (
        with_leads.select(
            F.col("__id").alias("left_id"),
            F.col("__s").alias("__ls"),
            F.explode("__nbrs").alias("__nb"),
        )
        .filter(F.col("__nb.rid").isNotNull())
        .select("left_id", "__ls", F.col("__nb.rid").alias("right_id"),
                F.col("__nb.rs").alias("__rs"))
    )
    # boundary stitch: e-th-from-end of bucket d pairs with p-th-from-
    # start of bucket d+1 when (e-1)+p <= window
    tail = with_leads.filter(F.col("__n") - F.col("__pos") < w).select(
        F.col("__db"),
        (F.col("__n") - F.col("__pos") + 1).alias("__e"),
        F.col("__id").alias("left_id"),
        F.col("__s").alias("__ls"),
    )
    head = with_leads.filter(F.col("__pos") <= w).select(
        (F.col("__db") - 1).alias("__db"),
        F.col("__pos").alias("__p"),
        F.col("__id").alias("right_id"),
        F.col("__s").alias("__rs"),
    )
    cross = (
        tail.join(head, "__db")
        .filter(F.col("__e") - 1 + F.col("__p") <= w)
        .select("left_id", "__ls", "right_id", "__rs")
    )
    pairs = in_pairs.unionByName(cross)
    if max_dist is None:
        return pairs.select("left_id", "right_id", F.lit(-1).alias("edit_dist"))
    dist = F.levenshtein(F.col("__ls"), F.col("__rs"), int(max_dist))
    return (
        pairs.select("left_id", "right_id", dist.alias("edit_dist"))
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= int(max_dist)))
    )
