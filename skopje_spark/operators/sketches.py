"""Mergeable sketch state: persistable partial aggregates for
incremental analytics (Datasketches HLL + KLL, built into Spark 4).

The 100 TB pattern these enable: compute a fixed-size sketch per
ingestion slice (day, partition, source), PERSIST the binary sketch
column, and answer "distinct users this quarter" / "p95 latency this
month" by merging a few thousand kilobyte-sized states — never
rescanning the raw data. This is the distinct/quantile analog of
``operators/rollup.py``'s sum/count partial-state maintenance
(reference parity: the reference delegates all aggregation to Postgres
SQL, /root/reference/src/extract/pg.rs:12-22; sketch state is the
Spark-native scale path for the two aggregates that don't decompose
into sums).

Determinism notes (the properties the oracle verdicts rely on):

- HLL union is a per-bucket max — commutative and associative — so the
  merged estimate is a pure function of the item *set*, independent of
  slice boundaries and merge order.
- KLL is RANDOMIZED by construction: compaction keeps odd or even
  survivors on a coin flip (that randomness is what makes the rank
  estimate unbiased), so two merges of the very same state bytes give
  different sketches. Only the rank-error bound (~1.65% of n at 99%
  confidence for k=200) is guaranteed. Downstream checks must
  therefore assert rank bands (estimate between the exact elements at
  rank (p±ε)·n with ε well above the bound), never exact or even
  run-to-run-equal values — that is how the oracle verdict for
  q_sketch_quantile_merge is built. :func:`kll_merge` still pins the
  cross-slice fold order (``sort_array`` on slice id) to remove the
  one variance source that is under our control.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skopje_spark.operators._lit import double_array_lit

__all__ = [
    "hll_state",
    "hll_merge",
    "hll_estimate",
    "kll_state",
    "kll_merge",
    "kll_quantiles",
    "hll_stream_sink",
    "hll_read_estimate",
    "kll_stream_sink",
    "kll_read_quantiles",
    "kmv_state",
    "kmv_merge",
    "kmv_estimate",
    "kmv_overlap",
    "kmv_stream_sink",
    "kmv_read_state",
]


def hll_state(
    df: DataFrame, keys: list[str], col: str, *, lg_k: int = 12
) -> DataFrame:
    """Per-key HLL sketch of ``col`` — the storable partial state.
    One aggregation pass; the shuffle carries 2^lg_k-byte sketches,
    not values."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({col}, {lg_k})").alias("hll_state")
    )


def hll_merge(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Union any number of per-slice state tables into one state per
    key. Associative + commutative (per-bucket max), so slices can be
    merged in any order, incrementally, across days or clusters."""
    if not states:
        raise ValueError("hll_merge needs at least one state table")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.expr("hll_union_agg(hll_state, true)").alias("hll_state")
    )


def hll_estimate(state: DataFrame, *, out_col: str = "approx_distinct") -> DataFrame:
    """Finalize: estimate distinct counts from the state."""
    return state.withColumn(out_col, F.expr("hll_sketch_estimate(hll_state)"))


def kll_state(
    df: DataFrame,
    keys: list[str],
    col: str,
    *,
    slice_col: str | Column | None = None,
    k: int = 200,
) -> DataFrame:
    """Per-(key, slice) KLL quantile sketch of double ``col``. The
    slice id (e.g. ingestion day) is carried alongside the sketch so
    merges can replay in a deterministic order."""
    cols = [F.col(c) for c in keys]
    if slice_col is not None:
        sl = F.col(slice_col) if isinstance(slice_col, str) else slice_col
        cols = cols + [sl.alias("kll_slice")]
    return (
        df.select(*cols, F.col(col).cast("double").alias("__v"))
        .groupBy(*[c for c in keys] + (["kll_slice"] if slice_col is not None else []))
        .agg(F.expr(f"kll_sketch_agg_double(__v, {k})").alias("kll_state"))
    )


def kll_merge(state: DataFrame, keys: list[str]) -> DataFrame:
    """Merge per-slice KLL states into one per key, folding in
    ascending ``kll_slice`` order (sort_array over (slice, sketch)
    structs) so the cross-slice merge order never depends on task
    scheduling. KLL compaction itself is coin-flip randomized (see
    module docstring), so consumers assert rank bands, not exact
    values."""
    slices = F.sort_array(
        F.collect_list(F.struct(F.col("kll_slice"), F.col("kll_state")))
    )
    merged = F.aggregate(
        F.slice(slices, 2, F.greatest(F.size(slices) - 1, F.lit(0))),
        F.element_at(slices, 1).getField("kll_state"),
        lambda acc, s: F.call_function(
            "kll_sketch_merge_double", acc, s.getField("kll_state")
        ),
    )
    return state.groupBy(*keys).agg(merged.alias("kll_state"))


def kll_quantiles(
    state: DataFrame, probs: list[float], *, prefix: str = "p"
) -> DataFrame:
    """Finalize: extract quantile estimates from the merged state as
    scalar columns (p50, p95, …)."""
    arr = F.call_function(
        "kll_sketch_get_quantile_double",
        F.col("kll_state"),
        double_array_lit(probs),
    )
    out = state
    for i, p in enumerate(probs):
        out = out.withColumn(f"{prefix}{int(round(p * 100))}", F.get(arr, i))
    return out.drop("kll_state")


def hll_stream_sink(
    stream_df,
    keys: list[str],
    col: str,
    state_path: str,
    checkpoint: str,
    *,
    lg_k: int = 12,
    available_now: bool = True,
):
    """Continuous distinct maintenance: each micro-batch appends its
    per-key HLL state (tagged with ``batch_id``) to a parquet state
    table; :func:`hll_read_estimate` answers "distinct so far" by
    merging the states — no event is ever rescanned.

    Exactly-once for free: HLL union is a per-bucket max, so merging a
    replayed batch's state twice equals merging it once — duplicate
    appends from micro-batch retries cannot inflate the estimate
    (property-tested in tests/test_sketches.py).
    """
    from pyspark.sql import functions as FF

    from skopje_spark.streaming.streams import foreach_batch_sink

    def write_batch(batch_df, batch_id: int) -> None:
        st = hll_state(batch_df, keys, col, lg_k=lg_k).withColumn(
            "batch_id", FF.lit(batch_id)
        )
        st.write.mode("append").parquet(state_path)

    return foreach_batch_sink(
        stream_df, checkpoint, write_batch, available_now=available_now
    )


def hll_read_estimate(spark, state_path: str, keys: list[str]) -> DataFrame:
    """Merge every persisted micro-batch state and estimate distinct
    counts per key — the O(batches × keys) read side of
    :func:`hll_stream_sink`."""
    st = spark.read.parquet(state_path).select(*keys, "hll_state")
    return hll_estimate(hll_merge([st], keys))


def kll_stream_sink(
    stream_df,
    keys: list[str],
    col: str,
    state_path: str,
    checkpoint: str,
    *,
    k: int = 200,
    available_now: bool = True,
):
    """Continuous quantile maintenance — the KLL twin of
    :func:`hll_stream_sink`: each micro-batch appends its per-key KLL
    state tagged with ``batch_id``; :func:`kll_read_quantiles` answers
    "p95 so far" by merging the states, never rescanning events.

    Exactly-once differs from HLL: KLL merge is NOT idempotent (a
    duplicated state double-weights its values), so the read side
    deduplicates to ONE state per (key, batch_id) before merging —
    ``batch_id`` is stable across micro-batch retries (foreachBatch
    contract), which restores replay safety without requiring the
    sketch bytes themselves to be reproducible (they aren't; KLL
    compaction is coin-flip randomized).
    """
    from pyspark.sql import functions as FF

    from skopje_spark.streaming.streams import foreach_batch_sink

    def write_batch(batch_df, batch_id: int) -> None:
        st = kll_state(batch_df, keys, col, k=k).withColumn(
            "batch_id", FF.lit(batch_id)
        )
        st.write.mode("append").parquet(state_path)

    return foreach_batch_sink(
        stream_df, checkpoint, write_batch, available_now=available_now
    )


def kll_read_quantiles(
    spark, state_path: str, keys: list[str], probs: list[float]
) -> DataFrame:
    """Read side of :func:`kll_stream_sink`: one deterministic
    survivor per (key, batch_id) — min over the binary state, so a
    retried batch's duplicate append is discarded rather than
    double-counted — then the pinned-order :func:`kll_merge` fold
    (batch_id as the slice) and quantile extraction. O(batches × keys)
    work regardless of how many events the states summarize."""
    st = (
        spark.read.parquet(state_path)
        .groupBy(*keys, "batch_id")
        .agg(F.min("kll_state").alias("kll_state"))
        .withColumnRenamed("batch_id", "kll_slice")
    )
    return kll_quantiles(kll_merge(st, keys), probs)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketches with SET OPERATIONS.
#
# HLL (above) answers |A| and |A ∪ B| (union = per-bucket max) but
# cannot estimate |A ∩ B| except by inclusion-exclusion, whose error
# grows with the union. KMV (Bar-Yossef et al. 2002; Beyer et al.
# SIGMOD'07 "distinct-value synopses") keeps the k smallest distinct
# hash values; because the k-min of A ∪ B is computable from the two
# sketches alone, it supports PRINCIPLED intersection / Jaccard
# estimates: rho = |KMV(A∪B) ∩ A ∩ B| / k is an unbiased Jaccard
# estimator and |A∩B| ≈ rho · D̂(A∪B). The 100 TB use: "how much does
# corpus B overlap corpus A" across sources/snapshots from two
# kilobyte synopses, no join over the raw data.
#
# Execution shape mirrors heavy_hitters (operators/freq.py): one
# narrow pass computing xxhash64 JVM-side, per-partition EXACT
# distinct k-min partials in Arrow batches (bounded O(k) memory),
# then a merge over <= partitions × k rows. The raw column values
# never shuffle.


def _kmv_u64(col) -> Column:
    """xxhash64 mapped to [0, 1): (h + 2^63) / 2^64 as double.
    Deterministic across runs/partitionings; ~52 effective mantissa
    bits — collision-safe far beyond any practical k."""
    return (F.xxhash64(col).cast("double") + F.lit(float(2**63))) / F.lit(
        float(2**64)
    )


def kmv_state(df: DataFrame, col: str, *, k: int = 256) -> DataFrame:
    """The KMV synopsis of ``col``: the k smallest DISTINCT normalized
    hash values, as a DataFrame ['h' double] with <= k rows (fewer
    iff the column has < k distinct values — then the sketch is an
    exact distinct inventory).

    Per-partition partials are exact bounded k-mins (a numpy unique +
    partial sort per Arrow batch, never more than 2k floats held), so
    the merge input is <= partitions × k rows regardless of
    cardinality.
    """

    def part(batches):
        import numpy as np
        import pandas as pd

        cur = np.empty(0, dtype=np.float64)
        for pdf in batches:
            vals = pdf["h"].to_numpy(dtype=np.float64)
            cur = np.unique(np.concatenate([cur, vals]))
            if len(cur) > k:
                cur = cur[:k]  # np.unique sorts ascending
        yield pd.DataFrame({"h": cur})

    partials = (
        df.filter(F.col(col).isNotNull())
        .select(_kmv_u64(F.col(col)).alias("h"))
        .mapInPandas(part, schema="h double")
    )
    return partials.distinct().orderBy("h").limit(k)


def kmv_merge(a: DataFrame, b: DataFrame, *, k: int = 256) -> DataFrame:
    """Union of two synopses: k-min of the combined hash sets. Closed
    under merge (the result is exactly KMV(A ∪ B)), commutative,
    associative, idempotent — the mergeable-summary contract."""
    return a.union(b).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, *, k: int = 256, out_col: str = "est") -> DataFrame:
    """Distinct-count estimate from a synopsis: (k-1)/u_k when the
    sketch is full (the classic unbiased KMV estimator), else the
    exact row count (sketch saw every distinct value). One row out."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("__n"), F.max("h").alias("__uk")
    )
    return agg.select(
        F.when(
            F.col("__n") < k, F.col("__n").cast("double")
        )
        .otherwise(F.lit(float(k - 1)) / F.col("__uk"))
        .alias(out_col)
    )


def kmv_overlap(a: DataFrame, b: DataFrame, *, k: int = 256) -> DataFrame:
    """Set-operation estimates from two synopses alone:

    ``(union_est, jaccard_est, intersect_est)`` — one row.

    K = KMV(A ∪ B) (from :func:`kmv_merge`); rho = fraction of K's
    members present in BOTH input sketches estimates J(A,B);
    intersect_est = rho × union_est. Standard error ~ J·(1±1/√k).
    All frames involved are <= k rows; the heavy lifting happened in
    :func:`kmv_state`'s single pass over each corpus.
    """
    merged = kmv_merge(a, b, k=k).localCheckpoint(eager=True)
    in_both = (
        merged.join(a, "h", "semi")
        .join(b, "h", "semi")
        .agg(F.count(F.lit(1)).alias("__both"))
    )
    msize = merged.agg(F.count(F.lit(1)).alias("__m"))
    est = kmv_estimate(merged, k=k, out_col="union_est")
    return (
        est.crossJoin(F.broadcast(in_both))
        .crossJoin(F.broadcast(msize))
        .select(
            "union_est",
            (F.col("__both") / F.col("__m")).alias("jaccard_est"),
            (F.col("__both") / F.col("__m") * F.col("union_est")).alias(
                "intersect_est"
            ),
        )
    )


def kmv_stream_sink(
    stream_df,
    col: str,
    state_path: str,
    checkpoint: str,
    *,
    k: int = 256,
    available_now: bool = True,
):
    """Continuous KMV maintenance — the set-operation member of the
    streaming sketch family (HLL, KLL, MG, CMS — see their sinks):
    each micro-batch appends its own k-min synopsis (<= k rows of one
    double). Unlike KLL/MG/CMS, the KMV merge is a pure SET union —
    IDEMPOTENT — so a replayed batch's duplicate rows are absorbed by
    the read side's distinct with no batch_id bookkeeping needed
    (batch_id is still recorded for observability)."""
    from skopje_spark.streaming.streams import foreach_batch_sink

    def write_batch(batch_df, batch_id: int) -> None:
        (
            kmv_state(batch_df, col, k=k)
            .withColumn("batch_id", F.lit(batch_id))
            # self-describing state: k rides with the rows so readers
            # can't silently take a k-min the batches never kept
            .withColumn("k", F.lit(k))
            .write.mode("append")
            .parquet(state_path)
        )

    return foreach_batch_sink(
        stream_df, checkpoint, write_batch, available_now=available_now
    )


def kmv_read_state(spark, state_path: str, *, k: int = 256) -> DataFrame:
    """Read side of :func:`kmv_stream_sink`: the k-min of the union of
    all batch synopses — exactly ``KMV(all values seen)`` restricted
    to values that made some batch's k-min, which contains the true
    global k-min (a global k-min hash is a k-min of its own batch a
    fortiori). Feed to :func:`kmv_estimate` / :func:`kmv_overlap`.

    Self-description guard (same contract as the CMS state): the
    persisted ``k`` must match this call's — a union k-min taken at
    k larger than any batch kept is NOT a valid KMV synopsis (its
    tail hashes were censored by the batch sketches) and would bias
    the estimator, so geometry mismatch raises instead."""
    # mergeSchema + NULL check: see mg_read_heavy_hitters — the guard
    # must fire for mixed legacy/new state, not be schema-picked away
    st = spark.read.option("mergeSchema", "true").parquet(state_path)
    if "k" in st.columns:
        vals = [r["k"] for r in st.select("k").distinct().collect()]
        if any(v is None for v in vals):
            raise ValueError(
                f"kmv_read_state: {state_path} mixes geometry-less legacy "
                f"rows with self-described rows — rebuild the state"
            )
        if len(vals) != 1:
            raise ValueError(
                f"kmv_read_state: mixed sketch sizes in {state_path}: "
                f"{sorted(vals)}"
            )
        if vals[0] != k:
            raise ValueError(
                f"kmv_read_state: state was built with k={vals[0]}, "
                f"read with k={k}"
            )
    return st.select("h").distinct().orderBy("h").limit(k)
