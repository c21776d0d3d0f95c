"""Data-quality checks — the validation stage of an ETL pipeline.

The reference's load contract pushes validation onto Postgres
constraints (PKs/FKs enforced at INSERT/COPY time,
``/root/reference/src/load/pg.rs:50-117``); a lake engine has no
enforcing store, so constraints become explicit *check operators* run
before the sink. Each check compiles to one aggregate or anti-join —
no collect, results are one summary row per check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    """Violations = rows where ``col`` is NULL."""
    return df.select(
        F.lit(f"not_null:{col}").alias("check_name"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per duplicate key (count -
    distinct count). Map-side partial agg; one shuffle on the key."""
    return df.agg(
        F.lit("unique:" + ",".join(cols)).alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]))
        .cast("bigint").alias("n_violations"),
    ).select("check_name", "n_violations")


def check_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Violations = non-null values outside [lo, hi]."""
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return df.select(
        F.lit(f"range:{col}").alias("check_name"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias("n_violations"),
    )


def check_foreign_key(
    facts: DataFrame, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    """Violations = fact rows whose FK has no match in the dimension —
    a left anti join (broadcast when the dim is small; the same plan
    shape as the KeyMap miss-detection, SURVEY §2A P2)."""
    orphans = facts.select(F.col(fk)).join(
        dim.select(F.col(pk).alias(fk)), fk, "left_anti"
    )
    return orphans.agg(
        F.lit(f"fk:{fk}").alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_violations"),
    ).select("check_name", "n_violations")


def run_checks(*checks: DataFrame) -> DataFrame:
    """Union the one-row check results into a report DataFrame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def table_digest(
    df: DataFrame,
    key_cols: list[str],
    cols: list[str],
    *,
    n_buckets: int = 64,
    exact: bool = True,
) -> DataFrame:
    """Merkle-style bucketed table fingerprints: ``(bucket, n_rows,
    digest)`` where rows are routed to ``n_buckets`` by a hash of
    their key and each bucket's digest is an ORDER-INDEPENDENT sha256
    over its row hashes (sorted before folding).

    The 100 TB use: validating that two copies of a table — primary
    vs replica, pre- vs post-migration, two lake regions — agree,
    WITHOUT shipping or sorting either table: each side computes its
    digest frame locally (one scan + one n_buckets-sized shuffle),
    the comparison is O(n_buckets) rows, and a mismatch pinpoints
    which key range to re-scan. This is the anti-entropy pattern of
    replicated stores (Merkle trees, flattened one level) expressed
    as a DataFrame aggregate.

    Determinism contract (what makes digests comparable across
    engines, partitionings, and row orders): row hash = sha256 over
    unit-separated canonical strings; bucket = 60-bit sha-derived key
    hash mod n_buckets (NOT xxhash — reproducible in DuckDB); bucket
    digest = sha256 over the lexicographically sorted row hashes.
    Columns must be string-safe types (ints/strings/dates) — doubles
    format differently across engines and belong in a rounded string
    column if needed. NULLs are encoded explicitly as a ``chr(0)``
    sentinel BEFORE folding (portable: ``coalesce(cast(c as
    varchar), chr(0))`` in DuckDB), so rows differing only in which
    column is NULL hash differently — plain ``concat_ws`` silently
    drops NULL arguments and would make ``(x, NULL, 'v')`` and
    ``(x, 'v', NULL)`` collide. Contract: chr(0) must not appear in
    live string data (it can't in cast-from-numeric/date output).

    Two tiers:

    - ``exact=True`` (default): the cryptographic sorted-fold digest.
      Per-bucket state is the row-hash list (32 B/row), so size
      n_buckets ~ rows / what-fits-one-task; right for validation
      sweeps where buckets are millions, not billions, of rows.
    - ``exact=False``: bounded-state incremental digest — SUM and
      XOR of the 60-bit row-hash ints (both commutative, map-side
      combined, O(1) per bucket however large). Collision resistance
      is that of a 120-bit additive checksum, not sha256 — ample for
      anti-entropy ("did anything change, and in which bucket"), and
      the only tier whose state stays bounded at any bucket size.
    """
    def _canon(c: str) -> Column:
        # NULL -> chr(0) sentinel: concat_ws skips NULL args, which
        # would collapse '(x, NULL, v)' and '(x, v, NULL)' to the
        # same string; coalescing first keeps every separator slot.
        return F.coalesce(F.col(c).cast("string"), F.lit("\x00"))

    key_str = F.concat_ws("\x1f", *[_canon(c) for c in key_cols])
    row_str = F.concat_ws("\x1f", *[_canon(c) for c in cols])
    bucket = F.pmod(
        F.conv(F.substring(F.sha2(key_str, 256), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    rh = F.sha2(row_str, 256)
    rows = df.select(bucket.alias("bucket"), rh.alias("__rh"))
    if not exact:
        h60 = F.conv(F.substring(F.col("__rh"), 1, 15), 16, 10).cast("bigint")
        return (
            rows.withColumn("__h", h60)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                # decimal accumulator: a sum of 60-bit ints overflows
                # int64 within ~16 rows; decimal(38,0) holds ~1e38
                F.sum(F.col("__h").cast("decimal(38,0)")).alias("digest_sum"),
                # bit_xor: commutative/associative, map-side combined
                F.expr("bit_xor(__h)").alias("digest_xor"),
            )
        )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sha2(
            F.concat_ws("", F.sort_array(F.collect_list("__rh"))), 256
        ).alias("digest"),
    )


def table_digest_update(
    digest: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    key_cols: list[str],
    cols: list[str],
    *,
    n_buckets: int = 64,
) -> DataFrame:
    """Incremental maintenance of the BOUNDED-STATE digest tier
    (:func:`table_digest` with ``exact=False``): fold a changelog
    into an existing digest frame WITHOUT rescanning the table.

    Possible because the sum/xor tier is a group homomorphism — sum
    is invertible (subtract removed rows) and xor self-inverse (xor
    again removes) — so
    ``update(digest(old), inserts, deletes) == digest(new)``
    EXACTLY (property-tested against operators/cdc.py's snapshot
    diff). An UPDATE is a delete of the OLD row image + insert of the
    new one. Note the changelog wiring: cdc_snapshot_diff /
    versioned_changes emit U rows with NEW-side values (D rows do
    carry old images), so the delete side must fetch U keys'
    BEFORE-images from the old snapshot — exactly what
    sinks/versioned.py:versioned_digest_frames does; use it. Feeding
    raw changelog rows in directly subtracts the wrong images for
    updates and silently drifts from the fresh digest (unit-pinned in
    tests/test_cdc.py). The exact sha tier cannot be maintained this
    way (sorted folds don't subtract); the pattern is: maintain
    sum/xor continuously, recompute the sha tier only for buckets
    whose cheap digest moved.

    Cost: O(|changes|) scan + one n_buckets-sized shuffle; the table
    itself is never touched.
    """
    deltas = []
    for frame, sign in ((inserts, 1), (deletes, -1)):
        d = table_digest(frame, key_cols, cols, n_buckets=n_buckets, exact=False)
        deltas.append(
            d.select(
                "bucket",
                (F.col("n_rows") * sign).alias("n_rows"),
                (F.col("digest_sum") * sign).alias("digest_sum"),
                F.col("digest_xor").alias("digest_xor"),
            )
        )
    all_parts = digest.select(
        "bucket", "n_rows", "digest_sum", "digest_xor"
    ).unionByName(deltas[0]).unionByName(deltas[1])
    return (
        all_parts.groupBy("bucket")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("digest_sum").alias("digest_sum"),
            F.expr("bit_xor(digest_xor)").alias("digest_xor"),
        )
        # buckets whose rows all vanished collapse to the empty state
        .filter(F.col("n_rows") > 0)
    )


def check_k_anonymity(
    df: DataFrame, quasi_cols: list[str], *, k: int = 10
) -> DataFrame:
    """Risky quasi-identifier groups: combinations of ``quasi_cols``
    shared by FEWER than ``k`` rows — the k-anonymity screen run on
    training data before release (a record in a group of size < k is
    re-identifiable by those attributes). Returns the violating
    combinations with their group sizes; empty means the table is
    k-anonymous w.r.t. the chosen quasi-identifiers.

    One groupBy on the quasi-identifier key (map-side combined);
    emitted rows ∝ violating combos only — nothing row-level leaves
    the executors.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def check_l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, *, l: int = 3
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE attribute takes fewer
    than ``l`` distinct values — the l-diversity refinement of
    :func:`check_k_anonymity` (a k-anonymous group still leaks the
    sensitive value if everyone in it shares one). Returns violating
    combos with group size and distinct-sensitive count; one groupBy,
    output ∝ violations."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def digest_compare(a: DataFrame, b: DataFrame) -> DataFrame:
    """Compare two digest frames (:func:`table_digest` output, either
    tier): one row per bucket with both sides' row counts and a
    ``match`` flag. The anti-entropy verdict — O(n_buckets) rows
    joined, neither table touched; mismatched buckets name the key
    ranges to re-sync. Buckets missing on one side (possible in the
    exact tier when a bucket is empty) compare as mismatched unless
    missing on both.

    EVERY non-bucket column participates in the match (packed into a
    struct with positional field names so the two sides compare
    field-by-field): the bounded tier's state is (n_rows, digest_sum,
    digest_xor) and all three must agree — checking only the last
    column would degrade the 120-bit sum+xor checksum to the 60-bit
    xor alone, passing change pairs whose row-hash xors cancel while
    the sums differ."""

    def _packed(df: DataFrame) -> Column:
        rest = [c for c in df.columns if c != "bucket"]
        return F.struct(
            *[F.col(c).alias(f"f{i}") for i, c in enumerate(rest)]
        )

    av = a.select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        _packed(a).alias("__da"),
    )
    bv = b.select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        _packed(b).alias("__db"),
    )
    return (
        av.join(bv, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("n_rows_a"), F.lit(0)).alias("n_rows_a"),
            F.coalesce(F.col("n_rows_b"), F.lit(0)).alias("n_rows_b"),
            (
                F.col("__da").eqNullSafe(F.col("__db"))
                & F.coalesce(F.col("n_rows_a"), F.lit(0)).eqNullSafe(
                    F.coalesce(F.col("n_rows_b"), F.lit(0))
                )
            )
            .cast("int")
            .alias("match"),
        )
    )


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    eps: float = 0.5,
    scale: int = 6,
) -> DataFrame:
    """Population stability index between two snapshots' distributions
    of a categorical column — the standard "has this feature drifted"
    monitor (rule of thumb: PSI < 0.1 stable, 0.1–0.25 moderate,
    > 0.25 action). Complements :func:`table_digest`: digests answer
    "did anything change", PSI answers "did the DISTRIBUTION move,
    and which categories moved it".

    One row per category in the UNION of both sides, with both raw
    counts, both Laplace-smoothed shares (additive ``eps`` over the
    union category count K: p = (c + eps)/(N + eps·K) — keeps the log
    finite for one-sided categories), and the signed PSI contribution
    ``(p_a − p_b)·ln(p_a / p_b)`` (always ≥ 0), rounded half-away at
    ``scale`` dp for cross-engine determinism. Σ contribution = PSI.

    Scale: two map-side-combined groupBys over the column (output =
    category cardinality), a tiny full-outer join, two scalar totals
    carried via broadcast-friendly crossJoin — nothing row-scale ever
    shuffles.
    """
    from skopje_spark.queries.rounding import dround

    ca = a.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    cb = b.groupBy(F.col(col).alias("__cat_b")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    # null-safe join: NULL is a legitimate category and must line up
    # across sides (a plain equi-join would split it into two
    # one-sided rows and report spurious drift on identical inputs)
    cats = (
        ca.join(
            cb, F.col("category").eqNullSafe(F.col("__cat_b")), "full_outer"
        )
        .select(
            F.coalesce(F.col("category"), F.col("__cat_b")).alias("category"),
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    totals = cats.agg(
        F.sum("n_a").alias("__ta"),
        F.sum("n_b").alias("__tb"),
        F.count(F.lit(1)).alias("__k"),
    )
    pa = (F.col("n_a") + F.lit(eps)) / (
        F.col("__ta") + F.lit(eps) * F.col("__k")
    )
    pb = (F.col("n_b") + F.lit(eps)) / (
        F.col("__tb") + F.lit(eps) * F.col("__k")
    )
    return cats.crossJoin(F.broadcast(totals)).select(
        "category",
        "n_a",
        "n_b",
        dround(pa, scale).alias("share_a"),
        dround(pb, scale).alias("share_b"),
        dround((pa - pb) * F.log(pa / pb), scale).alias("psi_contrib"),
    )


def psi_drift_binned(
    a: DataFrame,
    b: DataFrame,
    col: str,
    *,
    n_bins: int = 20,
    eps: float = 0.5,
    scale: int = 6,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """:func:`psi_drift` for NUMERIC columns: both sides are bucketed
    into ``n_bins`` fixed-width bins spanning [min, max] of the UNION,
    then the categorical PSI machinery runs on the bin ids — the
    histogram-drift monitor for continuous features (training-serving
    skew, snapshot-to-snapshot shift).

    Determinism: bin edges derive from exact MIN/MAX aggregates (no
    quantiles — percentile interpolation differs across engines in the
    last ulp and would flip edge bins), and bin assignment is pure
    IEEE-754 arithmetic, so Spark and a SQL oracle bucket identically.
    The top edge closes into the last bin; a constant column (max ==
    min) degenerates to one bin, PSI 0. NULLs form their own category
    via the null-safe machinery underneath.

    Output: one row per occupied bin with both counts, smoothed
    shares, and the signed PSI contribution — Σ contribution = PSI,
    same contract as :func:`psi_drift`. Scale: one extra
    min/max aggregate (broadcast as a 1-row frame) on top of
    psi_drift's two map-side-combined groupBys; bin count bounds every
    downstream row count. Pass explicit ``bounds=(lo, hi)`` when the
    feature's range is known (the usual monitoring setup) to skip
    that extra pass entirely — values outside clamp into the edge
    bins, exactly what a fixed monitoring histogram should do."""
    if bounds is not None:
        lo, hi = float(bounds[0]), float(bounds[1])
        if hi < lo:
            raise ValueError(f"bounds ({lo}, {hi}) are inverted")
        bframe = a.sparkSession.createDataFrame(
            [(lo, hi)], "__lo double, __hi double"
        )
    else:
        vals = a.select(F.col(col).alias("__v")).unionByName(
            b.select(F.col(col).alias("__v"))
        )
        bframe = vals.agg(
            F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
        )

    def binned(df: DataFrame) -> DataFrame:
        d = df.crossJoin(F.broadcast(bframe))
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
        raw = F.floor((F.col(col) - F.col("__lo")) / width)
        bin_id = F.when(F.col(col).isNull(), F.lit(None).cast("bigint")).otherwise(
            F.when(width == 0, F.lit(0)).otherwise(
                # greatest() clamps below-range values (possible only
                # with explicit bounds) into bin 0, least() clamps
                # above-range into the last bin
                F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0))
            ).cast("bigint")
        )
        return d.select(bin_id.alias("__bin"))

    return psi_drift(binned(a), binned(b), "__bin", eps=eps, scale=scale).withColumnRenamed(
        "category", "bin_id"
    )
