"""Sequence packing and document chunking for LLM training pipelines.

The reference's load path pushes rows into Postgres
(``/root/reference/src/load/pg.rs:50-117``); a training-data lake's
load path instead lands *fixed-length token sequences*. Two operators
cover the standard shapes:

- :func:`chunk_text` — split each document into overlapping
  fixed-width character windows (retrieval / embedding prep).
- :func:`pack_concat_chunk` — "concatenate and chunk" pretraining
  packing: lay every document end-to-end on a global token axis in a
  deterministic order, then cut the axis into ``ctx_len``-token
  sequences. A document that straddles a cut contributes tokens to
  both sequences, exactly like the common GPT-style data loader.

Scale design — the packing offset is a **global prefix sum**, and the
naive formulation (``sum().over(Window.orderBy(id))`` with no
partition key) collapses all data onto ONE task. :func:`global_prefix_sum`
does it in two passes instead:

1. range-repartition by the order key + sort within partitions, then
   one ``mapInPandas`` sweep computes each partition's *local* running
   sum (no shuffle beyond the range exchange);
2. the per-partition totals (one number per partition — a few KB at
   any scale) are prefix-summed and broadcast-joined back as base
   offsets.

Cost at 100 TB: one range shuffle of the (id, weight) projection — the
same price as a global sort, which any deterministic packing needs —
plus an O(num_partitions) driver step.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_len: int = 800,
    overlap: int = 100,
) -> DataFrame:
    """Overlapping character windows: chunk *i* covers
    ``[i*(chunk_len-overlap), i*(chunk_len-overlap) + chunk_len)``.
    Windows start while ``start < length - overlap`` (every chunk after
    the first contributes ≥ ``chunk_len - overlap`` new characters), and
    an empty/short document still yields its chunk 0.

    Pure narrow ops — ``sequence`` + ``explode`` + ``substring`` — so
    the whole thing stays in whole-stage codegen with no shuffle."""
    if not 0 <= overlap < chunk_len:
        raise ValueError("require 0 <= overlap < chunk_len")
    step = chunk_len - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            id_col,
            "chunk_id",
            "chunk_start",
            F.substring(F.col(text_col), F.col("chunk_start") + 1, chunk_len).alias(
                "chunk_text"
            ),
        )
    )


_PREFIX_SUM_RESERVED = ("__pid", "__local", "__base")

# minimum rows per prefix-sum bucket before another bucket pays for its
# fixed costs (Python task dispatch, totals row)
_MIN_BUCKET_ROWS = 8192


def _order_key_sample(
    df: DataFrame, order_cols: list[str], cap: int
) -> tuple[list[tuple], int]:
    """ONE pass over just the order columns returning (value-sorted
    deterministic key sample of ≤ ``cap`` tuples, total row count).

    The sample is the ``cap`` keys with the globally smallest
    ``xxhash64`` — a uniform pseudo-random sample with no prior count
    needed, kept bounded per task by a running ``nsmallest`` merge.
    The old shape paid one ``count()`` job plus one sampled-collect
    job (the count existed only to size the sample fraction); this is
    a single Arrow-batched job, and the count rides along for free."""
    import pandas as pd

    sel = df.select(*order_cols).withColumn(
        "__h", F.xxhash64(*[F.col(c) for c in order_cols])
    )
    fields = sel.schema.fields
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in fields
    )
    schema += ", `__cnt` bigint"

    def stats(batches):
        samp = None
        cnt = 0
        cols = [f.name for f in fields]
        for pdf in batches:
            cnt += len(pdf)
            pdf = pdf.dropna(subset=order_cols)
            cur = (
                pdf
                if samp is None
                else pd.concat([samp, pdf], ignore_index=True)
            )
            samp = cur.nsmallest(cap, "__h") if len(cur) > cap else cur
        out = (
            samp
            if samp is not None
            else pd.DataFrame({c: [] for c in cols})
        )
        out = out.copy()
        out["__cnt"] = None
        crow = pd.DataFrame({c: [None] for c in cols} | {"__cnt": [cnt]})
        yield pd.concat([out, crow], ignore_index=True)

    rows = sel.mapInPandas(stats, schema).collect()
    cnt = sum(int(r["__cnt"]) for r in rows if r["__cnt"] is not None)
    keyed = sorted(
        (
            (r["__h"], tuple(r[c] for c in order_cols))
            for r in rows
            if r["__cnt"] is None
        ),
    )[:cap]
    sample = sorted(t for _, t in keyed)
    return sample, cnt


def _cut_bounds(sample: list[tuple], n_parts: int) -> list[tuple]:
    """Cut a value-sorted key sample into ≤ ``n_parts - 1`` ascending
    split tuples (empty sample → single bucket)."""
    if not sample:
        return []
    bounds: list[tuple] = []
    for i in range(1, n_parts):
        cand = sample[min(i * len(sample) // n_parts, len(sample) - 1)]
        if not bounds or cand > bounds[-1]:
            bounds.append(cand)
    return bounds


def _range_bucket_bounds(
    df: DataFrame, order_cols: list[str], n_parts: int, per_part: int = 32
) -> list[tuple]:
    """Sample the order key(s) once and cut the sample into
    ``n_parts - 1`` ascending split tuples. The bounds are collected a
    single time and baked into the downstream plan as **literals**, so
    every pass over the data assigns the same bucket to the same row —
    the cross-pass consistency that ``repartitionByRange`` (which
    re-samples per job) could only provide by persisting the frame.

    Cost: ONE column-pruned pass (sample + count fused); bounds
    quality only affects load balance, never correctness — both
    passes bake the same literals."""
    sample, _ = _order_key_sample(
        df, order_cols, max(n_parts * per_part, 64)
    )
    return _cut_bounds(sample, n_parts)


def _bucket_of(cols: list[Column], bounds: list[tuple]) -> Column:
    """Bucket index = number of split tuples lexicographically <= the
    row's order key (all-null keys → bucket 0, matching NULLS FIRST
    sort order). A chained sum of comparisons stays in whole-stage
    codegen; for thousands of buckets swap in a binary search over an
    array literal."""
    expr: Column = F.lit(0)
    for b in bounds:
        # lexicographic (c1,c2,…) >= (b1,b2,…), built right-to-left
        ge = cols[-1] >= F.lit(b[-1])
        for c, lit in zip(reversed(cols[:-1]), reversed(b[:-1])):
            ge = (c > F.lit(lit)) | ((c == F.lit(lit)) & ge)
        expr = expr + F.when(ge, 1).otherwise(0)
    return expr.cast("int")


def global_prefix_sum(
    df: DataFrame,
    *,
    order_col: str | Sequence[str],
    weight_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` over the global
    ``order_col`` order (a single column or a lexicographic list of
    columns, e.g. ``["score", "doc_id"]`` for deterministic
    tie-breaking), without a single-task global window.

    Returns the input columns plus ``out_col`` = sum of all weights
    strictly before the row. Equivalent to
    ``sum(w).over(Window.orderBy(*order).rowsBetween(unboundedPreceding, -1))``
    but scalable. The bucket id is a **deterministic function of the
    row** (broadcast literal bounds, see :func:`_range_bucket_bounds`),
    so the per-bucket totals pass and the per-row cumsum pass agree
    without persisting anything — no cached state survives this call,
    and nothing the size of the data is ever held in executor storage
    (the previous design persisted the full frame, which is a
    non-starter at 100 TB).

    When multiple order columns are given, secondary columns must be
    non-null on rows where earlier columns tie (null secondaries would
    make the literal-bounds bucketing disagree with NULLS FIRST sort
    order at bucket edges)."""
    clash = [c for c in _PREFIX_SUM_RESERVED if c in df.columns]
    if clash:
        raise ValueError(
            f"global_prefix_sum reserves column names {clash}; rename them first"
        )
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    n_req = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sample, cnt = _order_key_sample(df, order_cols, max(n_req * 32, 64))
    # scale-adaptive bucket count: below ~8k rows per bucket the
    # per-bucket fixed costs (Python task dispatch in the cumsum pass,
    # the totals job) dominate the work they parallelize, so small
    # inputs collapse to fewer buckets — down to ONE, which also
    # skips the per-bucket-totals job entirely (base offset is 0 by
    # definition). At production row counts cnt/8192 >> parallelism
    # and this clamps to the requested width.
    if cnt > _MIN_BUCKET_ROWS:
        n_parts = max(2, min(n_req, cnt // _MIN_BUCKET_ROWS))
    else:
        n_parts = 1
    bounds = _cut_bounds(sample, n_parts) if n_parts > 1 else []
    keyed = df.withColumn(
        "__pid", _bucket_of([F.col(c) for c in order_cols], bounds)
    )

    if not bounds:
        base_df = df.sparkSession.createDataFrame(
            [(0, 0)], "__pid int, __base bigint"
        )
    else:
        # pass 1: per-bucket totals → exclusive base offsets (n_parts
        # rows; map-side partial agg, column-pruned scan of
        # order+weight only)
        totals = (
            keyed.groupBy("__pid")
            .agg(F.sum(F.coalesce(F.col(weight_col), F.lit(0))).alias("tot"))
            .collect()
        )
        base = {}
        acc = 0
        for row in sorted(totals, key=lambda r: r["__pid"]):
            base[row["__pid"]] = acc
            acc += int(row["tot"] or 0)
        base_df = df.sparkSession.createDataFrame(
            [(int(p), int(b)) for p, b in base.items()] or [(0, 0)],
            "__pid int, __base bigint",
        )

    # pass 2: co-locate each bucket (hash on __pid — a bucket must land
    # whole in one partition for the per-bucket carry to be exact; range
    # repartition could split it), sort within, one streaming cumsum
    # sweep per bucket (carry kept across Arrow batches)
    ranged = keyed.repartition(n_parts, F.col("__pid")).sortWithinPartitions(
        "__pid", *order_cols
    )

    fields = ranged.schema.fields
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
    out_schema += ", `__local` bigint"

    def local_cumsum(batches):
        carry: dict = {}
        for pdf in batches:
            w = pdf[weight_col].fillna(0).astype("int64")
            pids = pdf["__pid"]
            local = w.groupby(pids).cumsum() - w
            local = local + pids.map(lambda p: carry.get(p, 0)).astype("int64")
            for p, s in w.groupby(pids).sum().items():
                carry[p] = carry.get(p, 0) + int(s)
            pdf = pdf.copy()
            pdf["__local"] = local
            yield pdf

    local = ranged.mapInPandas(local_cumsum, schema=out_schema)
    return (
        local.join(F.broadcast(base_df), "__pid")
        .withColumn(out_col, F.col("__base") + F.col("__local"))
        .drop("__pid", "__base", "__local")
    )


def pack_concat_chunk(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: Column | str = "n_tokens",
    ctx_len: int = 2048,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid end-to-end in
    ``id_col`` order; sequence *s* owns token span
    ``[s*ctx_len, (s+1)*ctx_len)``. Output: one row per (document,
    sequence) overlap with the token count the document contributes —
    the shuffle-light description a sequence-assembly job consumes.

    Zero-token documents are dropped (they occupy no span)."""
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    t = df.select(F.col(id_col), tok.cast("long").alias("__tok")).filter(
        F.col("__tok") > 0
    )
    with_off = global_prefix_sum(
        t, order_col=id_col, weight_col="__tok", out_col="__start"
    )
    end = F.col("__start") + F.col("__tok")
    first_seq = F.floor(F.col("__start") / ctx_len)
    last_seq = F.floor((end - 1) / ctx_len)
    return (
        with_off.select(
            id_col,
            F.col("__tok"),
            F.col("__start"),
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        )
        .select(
            F.col(id_col),
            F.col("seq_id").cast("long").alias("seq_id"),
            (
                F.least(F.col("__start") + F.col("__tok"), (F.col("seq_id") + 1) * ctx_len)
                - F.greatest(F.col("__start"), F.col("seq_id") * ctx_len)
            )
            .cast("long")
            .alias("seq_tokens"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "",
    pos_col: str = "shuffle_pos",
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-data serving: every
    row gets a stable position on a pseudo-random axis — the rank of
    ``sha256(id || salt)``. Changing ``salt`` re-deals the order;
    re-running does not. With ``n_shards``, also emit the output shard
    (``pos % n_shards``) for round-robin sharded writes.

    Scale: rank = exclusive prefix-count over the hash order, computed
    with :func:`global_prefix_sum` (range shuffle + broadcast offsets),
    never a one-task global window."""
    keyed = df.withColumn(
        "__skey", F.sha2(F.concat(F.col(id_col).cast("string"), F.lit(salt)), 256)
    ).withColumn("__one", F.lit(1).cast("long"))
    ranked = global_prefix_sum(
        keyed, order_col="__skey", weight_col="__one", out_col=pos_col
    ).drop("__skey", "__one")
    if n_shards is not None:
        ranked = ranked.withColumn(
            "shard", F.pmod(F.col(pos_col), F.lit(n_shards)).cast("long")
        )
    return ranked


def chunk_by_tokens(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_chunk: int = 64,
    overlap: int = 16,
    token_pattern: str = "[A-Za-z0-9]+",
) -> DataFrame:
    """Token-window chunking — the context-length-aware sibling of
    :func:`chunk_text`: tokenize with a shared regex, then emit
    overlapping windows of ``tokens_per_chunk`` tokens (stride
    ``tokens_per_chunk - overlap``). This is how documents are split
    for a fixed-context model when chunk boundaries must fall between
    tokens, not mid-word at a byte offset.

    Chunk *i* covers tokens ``[i*stride, i*stride + tokens_per_chunk)``
    (1-based slice internally); windows start while
    ``start < n - overlap`` (same stop rule as :func:`chunk_text`), so
    every token lands in ≥ 1 chunk AND no trailing chunk is a strict
    subset of its predecessor — the last window always contributes at
    least one new token (a subset tail would silently over-weight
    document endings in the packed corpus). Tokenless documents yield
    no rows (nothing to pack). Pure narrow ops —
    ``regexp_extract_all`` + ``sequence`` + ``posexplode`` + ``slice``
    — no UDF, no shuffle, whole-stage codegen end to end.
    """
    if not 0 <= overlap < tokens_per_chunk:
        raise ValueError("require 0 <= overlap < tokens_per_chunk")
    step = tokens_per_chunk - overlap
    toks = F.regexp_extract_all(F.col(text_col), F.lit(token_pattern), 0)
    n = F.size(toks)
    # chunk starts (0-based): 0, step, ... while start < n - overlap;
    # the final start s satisfies s + tokens_per_chunk >= n (coverage)
    # because tokens_per_chunk = step + overlap
    max_start = F.floor(F.greatest(n - overlap - 1, F.lit(0)) / F.lit(step)) * step
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), max_start, F.lit(step)),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_id", "tok_start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("__toks"), F.col("tok_start").cast("int") + 1, tokens_per_chunk
            ).alias("__chunk_toks"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk_toks").alias("n_chunk_tokens"),
            F.array_join("__chunk_toks", " ").alias("chunk_text"),
        )
    )
