"""Frequent-items (heavy hitters) with bounded state: distributed
Misra–Gries summaries.

The 100 TB problem this solves: "which items dominate this column"
over a cardinality too large to groupBy-count (the exact plan's
shuffle and state are O(distinct); a web-scale token/URL/user column
can have billions of distinct values). Misra–Gries keeps at most
``m`` counters per partition, the partials merge by summation, and
the classic guarantee survives the merge (Agarwal et al., "Mergeable
Summaries", PODS'12):

    f(x) - n/(m+1)  <=  est(x)  <=  f(x)

for every item x (missing => est 0), where n is the TOTAL row count.
Hence any item with true frequency above n/(m+1) is guaranteed
present, and every estimate is exact up to an additive n/(m+1) —
order- and partitioning-INDEPENDENT bounds, which is what lets a
catalog query assert them as a deterministic verdict.

Execution shape: one pass, mapInPandas partials (vectorized
value_counts per Arrow batch + an O(m log m) compress), then one
shuffle of at most (m+1) rows per partition — state and network are
O(partitions × m), never O(distinct).

Provenance: a §2C-class extension beyond the reference's surface —
the reference delegates all aggregation to Postgres SQL strings
(/root/reference/src/extract/pg.rs:12-22), which has no bounded-state
frequency operator; this is the Spark-native scale path for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "heavy_hitters",
    "mg_stream_sink",
    "mg_read_heavy_hitters",
    "cms_build",
    "cms_merge",
    "cms_query",
    "cms_stream_sink",
    "cms_read_state",
]


def _mg_compress(counters: dict, m: int) -> dict:
    """Keep at most m counters: subtract the (m+1)-th largest count
    from all and drop the non-positive — the Misra–Gries decrement,
    batched. Total undercount introduced across a partition is at
    most n_p/(m+1)."""
    if len(counters) <= m:
        return counters
    sub = sorted(counters.values(), reverse=True)[m]
    return {k: c - sub for k, c in counters.items() if c > sub}


def _mg_partials(df: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra–Gries summaries as ``(item, cnt)`` rows —
    at most m item rows plus one NULL-item sentinel (carrying the
    partition's row count, so the error bound needs no second data
    pass) per partition. Shared by the batch and streaming paths so
    the kernel cannot diverge between them. NULL values in ``col``
    are not counted (the sentinel key is NULL)."""
    import pandas as pd  # noqa: F401

    item_t = dict(df.dtypes)[col]

    def part(batches):
        import pandas as pd

        counters: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            for k, v in pdf[col].value_counts(dropna=True).items():
                counters[k] = counters.get(k, 0) + int(v)
            counters = _mg_compress(counters, m)
        out = pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )
        sent = pd.DataFrame({"item": [None], "cnt": [n_p]})
        yield pd.concat([out, sent], ignore_index=True)

    return df.select(col).mapInPandas(part, schema=f"item {item_t}, cnt long")


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    m: int = 64,
) -> DataFrame:
    """Items whose estimated frequency survives an m-counter
    Misra–Gries sweep, with the merged estimate and the global error
    bound.

    Returns ``(item, est, err_bound)`` where ``est`` ∈
    [f(item) − err_bound, f(item)] and ``err_bound = n/(m+1)``;
    every item with f > err_bound is guaranteed to appear. ``item``
    keeps the input column's type.

    The input is summarized in ONE pass: the O(partitions × m)
    partials table is localCheckpointed before it feeds both the
    total-count and per-item branches below — without that, the two
    branches would each re-run the full scan + MG sweep.

    Side effect of that choice: calling this function EAGERLY executes
    the scan+sweep (it is not a lazy plan builder), and the small
    checkpointed partials stay in executor storage until the returned
    DataFrame is garbage collected. Batch-only: for streams use
    :func:`mg_stream_sink`.
    """
    partials = _mg_partials(df, col, m).localCheckpoint(eager=True)
    total = partials.filter(F.col("item").isNull()).agg(
        F.sum("cnt").alias("__n")
    )
    est = (
        partials.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("est"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "item",
        "est",
        (F.col("__n") / F.lit(float(m + 1))).alias("err_bound"),
    )


def mg_stream_sink(
    stream_df,
    col: str,
    state_path: str,
    checkpoint: str,
    *,
    m: int = 64,
    available_now: bool = True,
):
    """Continuous heavy-hitter maintenance — the Misra–Gries member of
    the streaming sketch family (HLL distinct, KLL quantiles, MG
    frequencies; see operators/sketches.py): each micro-batch appends
    its m-counter summary rows tagged with ``batch_id``;
    :func:`mg_read_heavy_hitters` merges them by summation without
    rescanning events.

    Like KLL (and unlike HLL), summation is not replay-idempotent, so
    the read side deduplicates to one summary per (item, batch_id) —
    batch_id is stable across micro-batch retries. The per-batch
    summary is itself MG-compressed, so state appended per batch is
    O(m + 1) rows regardless of batch size or cardinality.
    """
    from pyspark.sql import functions as FF

    from skopje_spark.streaming.streams import foreach_batch_sink

    def write_batch(batch_df, batch_id: int) -> None:
        (
            _mg_partials(batch_df, col, m)
            # one summary row per item per batch: partition partials
            # merge by sum BEFORE landing, so state grows O(m)/batch
            .groupBy("item")
            .agg(FF.sum("cnt").alias("cnt"))
            .withColumn("batch_id", FF.lit(batch_id))
            # self-describing state: m rides with the rows so the read
            # side can't report an error bound the state doesn't support
            .withColumn("m", FF.lit(m))
            .write.mode("append")
            .parquet(state_path)
        )

    return foreach_batch_sink(
        stream_df, checkpoint, write_batch, available_now=available_now
    )


def mg_read_heavy_hitters(spark, state_path: str, *, m: int = 64) -> DataFrame:
    """Read side of :func:`mg_stream_sink`: dedup to one summary per
    (item, batch_id) — max over the count, so a retried batch's
    duplicate append is discarded — then merge by summation. The
    guarantee degrades gracefully with per-batch compression: est ∈
    [f − n/(m+1)·batches_compressed, f]; err_bound reports the sum of
    per-batch error budgets (n/(m+1)) exactly as the batch view of
    the bound.

    Self-description guard (same contract as the CMS state): when the
    persisted ``m`` differs from this call's, the reported
    ``err_bound`` = n/(m+1) would claim a tightness the m-counter
    summaries never provided — mismatches raise instead."""
    from pyspark.sql import functions as FF

    # mergeSchema: a state dir written partly before the geometry
    # column existed must still SURFACE the column (legacy rows as
    # NULL) — otherwise schema-picking could silently skip the guard
    st = spark.read.option("mergeSchema", "true").parquet(state_path)
    if "m" in st.columns:
        vals = [r["m"] for r in st.select("m").distinct().collect()]
        if any(v is None for v in vals):
            raise ValueError(
                f"mg_read_heavy_hitters: {state_path} mixes geometry-less "
                f"legacy rows with self-described rows — rebuild the state"
            )
        if len(vals) != 1:
            raise ValueError(
                f"mg_read_heavy_hitters: mixed summary sizes in "
                f"{state_path}: {sorted(vals)}"
            )
        if vals[0] != m:
            raise ValueError(
                f"mg_read_heavy_hitters: state was built with "
                f"m={vals[0]}, read with m={m}"
            )
    dedup = st.groupBy("item", "batch_id").agg(FF.max("cnt").alias("cnt"))
    est = (
        dedup.filter(FF.col("item").isNotNull())
        .groupBy("item")
        .agg(FF.sum("cnt").alias("est"))
    )
    total = dedup.filter(FF.col("item").isNull()).agg(FF.sum("cnt").alias("__n"))
    return est.crossJoin(FF.broadcast(total)).select(
        "item",
        "est",
        (FF.col("__n") / float(m + 1)).alias("err_bound"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: point-queryable frequency estimates in O(depth × width)
# state — the complement of Misra–Gries above. MG answers "which items are
# frequent" (it FORGETS the tail); CMS answers "how often does item x occur"
# for ANY x, with a one-sided guarantee:
#
#     exact(x)  <=  est(x)  <=  exact(x) + eps·N      (eps ~ e/width)
#
# the lower bound DETERMINISTIC (hash collisions only ever add), the upper
# probabilistic per hash row with failure ~ exp(-depth) after the min.
# Mergeable by cell-wise summation (Cormode & Muthukrishnan '05), so slices
# sketch independently and the states union — same persistence pattern as
# the HLL/KLL/MG family in operators/sketches.py.


def _cms_cells(df: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """(r, bucket) cell per item per hash row r: bucket_r(x) =
    pmod(xxhash64(x, r), width). All JVM-side codegen."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.col(col).alias("__x"),
            F.explode(
                F.array(*[F.lit(i) for i in range(depth)])
            ).alias("r"),
        )
        .select(
            "r",
            F.pmod(F.xxhash64(F.col("__x"), F.col("r")), F.lit(width)).alias(
                "bucket"
            ),
        )
    )


def cms_build(df: DataFrame, col: str, *, depth: int = 4, width: int = 2048) -> DataFrame:
    """Build the sketch: sparse (r, bucket, cnt) cell counts. The
    groupBy's map-side partial aggregation bounds the shuffle at
    partitions × depth × width rows however large or skewed the
    input; the stored state is at most depth × width cells."""
    return (
        _cms_cells(df, col, depth, width)
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise summation — the two sketches must share (depth,
    width, hash family), which they do by construction here since the
    hash family is fixed (xxhash64 seeded by row index)."""
    return a.union(b).groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    cms: DataFrame, probes: DataFrame, col: str, *, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Point-query estimates for every row of ``probes[col]``:
    est(x) = min over hash rows of the cell count (0 for an empty
    cell — x was never seen by that row). Returns ``(col, est)``.

    The probe side fans out to depth rows per probe and hash-joins
    the O(depth × width) cell table — never the original data.

    Self-description guard: a sketch frame that carries ``depth`` /
    ``width`` metadata columns (:func:`cms_read_state` output) is
    validated against this call's parameters — querying a sketch
    built at another geometry would silently hash probes into the
    wrong cells and return garbage estimates, so it raises instead."""
    if "depth" in cms.columns and "width" in cms.columns:
        meta = cms.select("depth", "width").distinct().collect()
        if len(meta) > 1:
            raise ValueError(f"cms_query: mixed sketch geometries in state: {meta}")
        if meta and (meta[0]["depth"] != depth or meta[0]["width"] != width):
            raise ValueError(
                f"cms_query: sketch was built with depth={meta[0]['depth']} "
                f"width={meta[0]['width']}, queried with depth={depth} width={width}"
            )
        cms = cms.drop("depth", "width")
    cells = (
        probes.select(F.col(col))
        .distinct()
        .select(
            col,
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r"),
        )
        .select(
            col,
            "r",
            F.pmod(F.xxhash64(F.col(col), F.col("r")), F.lit(width)).alias(
                "bucket"
            ),
        )
    )
    return (
        cells.join(cms, ["r", "bucket"], "left")
        .select(col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(col)
        .agg(F.min("cnt").alias("est"))
    )


def cms_stream_sink(
    stream_df,
    col: str,
    state_path: str,
    checkpoint: str,
    *,
    depth: int = 4,
    width: int = 2048,
    available_now: bool = True,
):
    """Continuous count-min maintenance — the CMS member of the
    streaming sketch family (HLL distinct, KLL quantiles, MG top
    items, CMS point frequencies): each micro-batch appends its own
    sparse cell table tagged with ``batch_id``; state appended per
    batch is at most depth × width rows regardless of batch size.
    Cell-wise summation is not replay-idempotent (same caveat as
    KLL/MG), so the read side deduplicates to one cell table per
    (batch_id) — batch_id is stable across micro-batch retries."""
    from pyspark.sql import functions as FF

    from skopje_spark.streaming.streams import foreach_batch_sink

    def write_batch(batch_df, batch_id: int) -> None:
        (
            cms_build(batch_df, col, depth=depth, width=width)
            .withColumn("batch_id", FF.lit(batch_id))
            # self-describing state: geometry rides with the cells so
            # readers can't silently query at a different (depth, width)
            .withColumn("depth", FF.lit(depth))
            .withColumn("width", FF.lit(width))
            .write.mode("append")
            .parquet(state_path)
        )

    return foreach_batch_sink(
        stream_df, checkpoint, write_batch, available_now=available_now
    )


def cms_read_state(spark, state_path: str) -> DataFrame:
    """Read side of :func:`cms_stream_sink`: collapse any replayed
    batch appends (max per cell within a batch — a batch's cell table
    is deterministic, so max == the single true value), then merge all
    batches by cell-wise summation. The result is a sketch frame for
    :func:`cms_query` that KEEPS the persisted ``depth``/``width``
    metadata columns, so a query at mismatched geometry raises
    instead of silently mis-hashing; mixed geometries within one
    state directory (a sink reconfigured mid-stream) raise here."""
    from pyspark.sql import functions as FF

    st = spark.read.option("mergeSchema", "true").parquet(state_path)
    if "depth" in st.columns and "width" in st.columns:
        meta = st.select("depth", "width").distinct().collect()
        if len(meta) != 1 or any(
            r["depth"] is None or r["width"] is None for r in meta
        ):
            raise ValueError(
                f"cms_read_state: mixed sketch geometries (or geometry-less "
                f"legacy rows) in {state_path}: "
                f"{[(r['depth'], r['width']) for r in meta]}"
            )
        d, w = meta[0]["depth"], meta[0]["width"]
        dedup = st.groupBy("batch_id", "r", "bucket").agg(
            FF.max("cnt").alias("cnt")
        )
        return (
            dedup.groupBy("r", "bucket")
            .agg(FF.sum("cnt").alias("cnt"))
            .withColumn("depth", FF.lit(d))
            .withColumn("width", FF.lit(w))
        )
    # legacy state written before geometry persistence: no guard possible
    dedup = st.groupBy("batch_id", "r", "bucket").agg(FF.max("cnt").alias("cnt"))
    return dedup.groupBy("r", "bucket").agg(FF.sum("cnt").alias("cnt"))
