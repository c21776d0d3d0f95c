"""Cardinality estimation from coordinated key samples.

"How big will this join be?" is the question that decides shuffle
partition counts, broadcast eligibility, and skew strategy BEFORE
running a 100 TB join. Exact pre-computation costs the join itself;
this module answers it from a tiny, deterministic sample.

Technique — coordinated (hash-correlated) Bernoulli KEY sampling
(the "end-biased" / correlated-sampling family, cf. Vengerov et al.,
"Join Size Estimation Subject to Filter Conditions", VLDB 2015):
both sides keep a key iff ``xxhash64(key, seed) mod M < p·M``. The
SAME hash on both sides means a sampled key survives on both sides
or neither — so the sampled sub-join is an unbiased miniature of the
real one, unlike independent row sampling (where matching rows
rarely co-survive and the estimate collapses):

    E[ Σ_{v sampled} f_A(v)·f_B(v) / p ] = Σ_v f_A(v)·f_B(v) = |A ⋈ B|

Everything is deterministic given the seed: same data → same sample
→ same estimate, so results are reproducible and testable to exact
values, not just in expectation.

Scale: the filter is a pushed-down cheap predicate on each scan; the
per-side per-key counts aggregate map-side (the sampled key space is
p of the original); the count join is tiny. Cost ≈ two partial scans
+ one small shuffle — nothing proportional to the join output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_003  # prime modulus; inclusion prob = _thr(rate)/_MOD exactly


def _thr(rate: float) -> int:
    t = int(rate * _MOD)
    if not (0 < t < _MOD):
        raise ValueError(f"rate {rate} out of (0, 1)")
    return t


def key_sample(df: DataFrame, key: str, *, rate: float, seed: int = 7) -> DataFrame:
    """Deterministic key-coordinated sample: keeps every row whose KEY
    hashes under the rate threshold (all-or-nothing per key value, the
    property join estimation needs). The predicate is a plain column
    expression — Catalyst pushes it into the scan.

    The key is hashed through its STRING form so the two join sides
    agree regardless of physical type (int vs bigint columns hash
    differently raw; a bigint cast would crash ANSI sessions on
    string/UUID keys and collapse them to one NULL key otherwise)."""
    h = F.pmod(F.xxhash64(F.col(key).cast("string"), F.lit(seed)), F.lit(_MOD))
    return df.filter(h < F.lit(_thr(rate)))


def sampled_join_size(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    *,
    rate: float = 0.05,
    seed: int = 7,
) -> DataFrame:
    """One-row frame estimating |A ⨝ B| on ``a_key = b_key``:
    ``est_join_size`` (double) plus ``sampled_keys`` diagnostics.

    Per-key frequencies are computed on each SAMPLED side (map-side
    combined over p of the keys), joined on the key, and
    Σ f_A·f_B is scaled by the exact inclusion probability. Relative
    error ~ sqrt((1/p − 1)·Σv² )/Σv with v = f_A·f_B — tight when the
    key space is large, which is exactly when estimation matters."""
    thr = _thr(rate)
    fa = (
        key_sample(a, a_key, rate=rate, seed=seed)
        .groupBy(F.col(a_key).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__fa"))
    )
    fb = (
        key_sample(b, b_key, rate=rate, seed=seed)
        .groupBy(F.col(b_key).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__fb"))
    )
    return fa.join(fb, "__k").agg(
        (
            F.coalesce(F.sum(F.col("__fa") * F.col("__fb")), F.lit(0)).cast("double")
            * F.lit(float(_MOD) / thr)
        ).alias("est_join_size"),
        F.count(F.lit(1)).alias("sampled_keys"),
    )


def join_advice(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    *,
    rate: float = 0.05,
    seed: int = 7,
    broadcast_bytes: int = 64 * 1024 * 1024,
    row_bytes: int = 100,
    skew_share: float = 0.2,
) -> DataFrame:
    """Pre-join planning card from the same coordinated sample: one
    row with the estimated join size, each side's estimated row count
    and distinct-key count, the heaviest sampled key's share of the
    estimated output, and a ``recommendation``:

    - ``broadcast_a`` / ``broadcast_b`` — a side's estimated bytes
      (rows × ``row_bytes``) fit under ``broadcast_bytes``;
    - ``salt`` — the single heaviest key carries more than
      ``skew_share`` of the estimated join output (the salted-join /
      AQE-skew regime);
    - ``shuffle`` — otherwise: a plain key-partitioned join is fine.

    All inputs to the verdict are sampled estimates scaled by 1/p —
    the card costs two pushed-down sampled scans, never the join.
    Row-size is a caller-supplied constant because sampling bytes
    would need a full-row scan, exactly what this avoids; pass your
    table's real average when you have catalog stats."""
    thr = _thr(rate)
    scale = float(_MOD) / thr

    def side(df, key, fa_name, keys_name):
        return (
            key_sample(df, key, rate=rate, seed=seed)
            .groupBy(F.col(key).cast("string").alias("__k"))
            .agg(F.count(F.lit(1)).alias(fa_name))
        )

    fa = side(a, a_key, "__fa", "ka")
    fb = side(b, b_key, "__fb", "kb")
    per_key = fa.join(fb, "__k").select(
        "__k", (F.col("__fa") * F.col("__fb")).cast("double").alias("__v")
    )
    card = per_key.agg(
        (F.coalesce(F.sum("__v"), F.lit(0.0)) * scale).alias("est_join_size"),
        (F.coalesce(F.max("__v"), F.lit(0.0)) * scale).alias("__max_key_out"),
    )
    sa = fa.agg(
        (F.sum("__fa") * scale).alias("est_rows_a"),
        (F.count(F.lit(1)) * scale).alias("est_keys_a"),
    )
    sb = fb.agg(
        (F.sum("__fb") * scale).alias("est_rows_b"),
        (F.count(F.lit(1)) * scale).alias("est_keys_b"),
    )
    joined = card.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    top_share = F.when(
        F.col("est_join_size") > 0,
        F.col("__max_key_out") / F.col("est_join_size"),
    ).otherwise(F.lit(0.0))
    rec = (
        F.when(
            F.col("est_rows_a") * F.lit(row_bytes) <= F.lit(broadcast_bytes),
            F.lit("broadcast_a"),
        )
        .when(
            F.col("est_rows_b") * F.lit(row_bytes) <= F.lit(broadcast_bytes),
            F.lit("broadcast_b"),
        )
        .when(top_share > F.lit(skew_share), F.lit("salt"))
        .otherwise(F.lit("shuffle"))
    )
    return joined.select(
        "est_join_size",
        "est_rows_a",
        "est_rows_b",
        "est_keys_a",
        "est_keys_b",
        top_share.alias("top_key_share"),
        rec.alias("recommendation"),
    )


def join_advice_from_stats(
    path_a: str,
    a_key: str,
    path_b: str,
    b_key: str,
    *,
    broadcast_bytes: int = 64 * 1024 * 1024,
    row_bytes: int = 100,
    skew_share: float = 0.2,
) -> dict:
    """The ZERO-JOB planning card: the same
    broadcast/salt/shuffle decision as :func:`join_advice`, answered
    entirely from each versioned table's recorded ANALYZE statistics
    (``versioned_analyze`` / ``table_stats``) — no scan, no sample,
    pure driver arithmetic. Join size uses the System-R containment
    estimate ``rows_a × rows_b / max(ndv_a, ndv_b)``.

    Skew: ANALYZE folds a Misra-Gries top-k per column into
    ``column_stats`` (``top`` item/estimate pairs, canonical-string
    keys), so the card estimates the heaviest key's share of the
    join output the same way the sampled card does — per-key output
    ``f_A(k)·f_B(k)`` maximized over the union of both sides' top
    lists, a side's frequency defaulting to ``rows/ndv`` for a key
    absent from its list (the containment assumption). ``salt`` is
    recommended when that share crosses ``skew_share`` and neither
    side broadcasts; tables analyzed BEFORE the skew fold carry no
    ``top`` lists and degrade to broadcast/shuffle-only exactly as
    before. Each side's ``versions_stale`` is reported so a planner
    can decide when the facts are too old to trust. Raises when a
    side was never analyzed or its key column wasn't covered — a
    loud prompt to run ``versioned_analyze``, never a silent
    guess."""
    from skopje_spark.sinks.versioned import table_stats

    cards = {}
    tops = {}
    for side, (path, key) in (("a", (path_a, a_key)), ("b", (path_b, b_key))):
        st = table_stats(path)
        if st is None:
            raise ValueError(
                f"side {side} ({path}) has no recorded ANALYZE stats — "
                "run versioned_analyze first"
            )
        if key not in st["columns"]:
            raise KeyError(
                f"side {side} ({path}) was analyzed without column "
                f"{key!r} — re-run versioned_analyze including it"
            )
        cards[side] = {
            "rows": int(st["n_rows"]),
            "ndv": int(st["columns"][key]["ndv"]),
            "versions_stale": int(st["versions_stale"]),
        }
        tops[side] = dict(st["columns"][key].get("top") or [])
    ra, rb = cards["a"]["rows"], cards["b"]["rows"]
    nda = max(cards["a"]["ndv"], 1)
    ndb = max(cards["b"]["ndv"], 1)
    est = ra * rb / max(nda, ndb)
    top_share = 0.0
    if (tops["a"] or tops["b"]) and est > 0:
        top_out = 0.0
        for k in set(tops["a"]) | set(tops["b"]):
            fa = float(tops["a"].get(k, ra / nda))
            fb = float(tops["b"].get(k, rb / ndb))
            top_out = max(top_out, fa * fb)
        top_share = min(1.0, top_out / est)
    if ra * row_bytes <= broadcast_bytes:
        rec = "broadcast_a"
    elif rb * row_bytes <= broadcast_bytes:
        rec = "broadcast_b"
    elif top_share > skew_share:
        rec = "salt"
    else:
        rec = "shuffle"
    return {
        "est_join_rows": est,
        "a": cards["a"],
        "b": cards["b"],
        "top_key_share": top_share,
        "recommendation": rec,
    }


def join_advice_auto(
    spark,
    path_a: str,
    a_key: str,
    path_b: str,
    b_key: str,
    *,
    max_stale: int = 0,
    rate: float = 0.05,
    seed: int = 7,
    broadcast_bytes: int = 64 * 1024 * 1024,
    row_bytes: int = 100,
    skew_share: float = 0.2,
) -> dict:
    """The planning entry a pipeline actually calls: answer the
    broadcast/shuffle decision from each table's carried ANALYZE
    statistics when BOTH sides' stats are fresh enough
    (``versions_stale <= max_stale``) — zero Spark jobs, pure driver
    arithmetic over kilobyte markers — and FALL BACK to the
    coordinated-sample card (:func:`join_advice`, two pushed-down
    sampled scans) when either side was never analyzed or its stats
    have gone stale. Returns a dict with ``source`` ∈
    {"stats", "sample"} so the caller can see which tier answered.

    Scale: on a maintained lake the stats path answers every
    recurring join plan for free; the sample only runs after enough
    un-analyzed commits land — the classic catalog-stats-with-
    sampling-backstop planner split."""
    from skopje_spark.sinks.versioned import table_stats

    fresh = True
    for path, key in ((path_a, a_key), (path_b, b_key)):
        st = table_stats(path)
        if (
            st is None
            or key not in st["columns"]
            or int(st["versions_stale"]) > max_stale
        ):
            fresh = False
            break
    if fresh:
        card = join_advice_from_stats(
            path_a, a_key, path_b, b_key,
            broadcast_bytes=broadcast_bytes, row_bytes=row_bytes,
            skew_share=skew_share,
        )
        card["source"] = "stats"
        return card
    from skopje_spark.sinks.versioned import versioned_read

    row = join_advice(
        versioned_read(spark, path_a),
        versioned_read(spark, path_b),
        a_key, b_key,
        rate=rate, seed=seed,
        broadcast_bytes=broadcast_bytes, row_bytes=row_bytes,
        skew_share=skew_share,
    ).first()
    return {
        "est_join_rows": float(row["est_join_size"]),
        "a": {"rows": float(row["est_rows_a"]),
              "ndv": float(row["est_keys_a"])},
        "b": {"rows": float(row["est_rows_b"]),
              "ndv": float(row["est_keys_b"])},
        "top_key_share": float(row["top_key_share"]),
        "recommendation": row["recommendation"],
        "source": "sample",
    }
