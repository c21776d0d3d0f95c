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
