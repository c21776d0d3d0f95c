"""Round-6 scale operators as oracle-checked catalog queries:
embedding compression (int8 quantize, JL projection), bounded-state
heavy hitters, fixed-iteration PageRank, distribution window
functions, and corpus-LM document scoring.

Oracle discipline (see queries/__init__): digests and verdicts are
built only from constructions both engines compute bit-identically
(sequential list folds, integer arithmetic, the dround primitive) or
from mathematically order-independent guarantees (the Misra–Gries
band), so the value hashes are stable across engines and partition
layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table

# ---------------------------------------------------------------------------
# int8 scalar quantization


_SYM_ROUND_SQL = (
    "CASE WHEN ({x}) < 0 THEN -FLOOR(-({x}) + 0.5) ELSE FLOOR(({x}) + 0.5) END"
)


@register(
    "q_embed_quantize_int8",
    oracle=f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> ABS(x))) / 127.0 AS qscale
      FROM base
    ),
    q AS (
      SELECT vec_id, qscale,
             CASE WHEN qscale = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x -> CAST(
                       {_SYM_ROUND_SQL.format(x='x / qscale')} AS BIGINT))
             END AS qv
      FROM scaled
    )
    SELECT vec_id,
           qscale,
           CAST(list_sum(list_transform(range(1, len(qv) + 1),
                    i -> qv[i] * i)) AS BIGINT) AS q_posdigest,
           CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_sqsum,
           qv[1] AS q_first
    FROM q
    ORDER BY vec_id
    """,
    tags=("embedding", "quantize", "compression", "llm-pipeline"),
)
def q_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column
    (operators/quantize.py): scale = max|x|/127, codes in [-127,127] —
    the 4× storage cut applied before persisting an embedding lake.

    Exact cross-engine oracle: the scale is comparison+division only
    (no summation, bit-deterministic) and the codes are integers, so
    the emitted digests (position-weighted sum, sum of squares, first
    code) hash identically. Reconstruction-error bounds are
    unit-checked in tests/test_scale_ops.py.
    """
    from skopje_spark.operators.quantize import quantize_int8

    e = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(e, vec_col="embedding")
    idx = F.sequence(F.lit(1), F.size("qvec"))
    return q.select(
        "vec_id",
        "qscale",
        F.aggregate(
            F.zip_with(F.col("qvec"), idx, lambda qq, i: qq.cast("long") * i),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("q_posdigest"),
        F.aggregate(
            F.transform(F.col("qvec"), lambda qq: qq.cast("long") * qq.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("q_sqsum"),
        F.element_at("qvec", 1).cast("long").alias("q_first"),
    )


# ---------------------------------------------------------------------------
# JL random projection


def _proj_dim_sql(plane: int) -> str:
    """One projected dimension, with the Hadamard sign row inlined as
    LITERALS (the Spark plan bakes the same values in as literals, so
    the two engines share the matrix by construction rather than by
    re-derivation)."""
    from skopje_spark.operators.quantize import projection_signs

    signs = ", ".join(f"{s:.1f}" for s in projection_signs(plane, 64))
    return (
        f"list_sum(list_transform(range(1, len(v) + 1), "
        f"i -> v[i] * ([{signs}])[i])) / 4.0"
    )


@register(
    "q_embed_random_projection",
    oracle=f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    proj AS (
      SELECT vec_id,
             {", ".join(f"({_proj_dim_sql(p)}) AS y{p}" for p in range(16))}
      FROM base
    )
    SELECT vec_id,
           {dround_sql('y0', 6)} AS proj_first,
           {dround_sql('+'.join(f'y{p} * {p + 1}' for p in range(16)), 6)}
             AS proj_posdigest,
           {dround_sql('sqrt(' + '+'.join(f'y{p} * y{p}' for p in range(16)) + ')', 6)}
             AS proj_norm
    FROM proj
    ORDER BY vec_id
    """,
    tags=("embedding", "projection", "jl", "compression", "llm-pipeline"),
)
def q_embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign-matrix projection 64→16
    (operators/quantize.py): the dimensionality cut applied before ANN
    indexing or pairwise scans. The ±1 matrix is literal-baked into
    the plan (codegen narrow map, no shuffle/join/UDF).

    Oracle: DuckDB regenerates the deterministic sign pattern from the
    same index arithmetic and folds each output dim SEQUENTIALLY, the
    same left-to-right order as Spark's F.aggregate — bit-identical
    doubles, rounded once at the digest. Geometry preservation
    (pairwise cosine drift) is unit-checked in
    tests/test_scale_ops.py.
    """
    from skopje_spark.operators.quantize import random_projection

    e = load_table(spark, sf_dir, "embeddings")
    p = random_projection(e, vec_col="embedding", out_dim=16, dim=64)
    y = F.col("proj")
    idx = F.sequence(F.lit(1), F.size("proj"))
    return p.select(
        "vec_id",
        dround(F.element_at(y, 1), 6).alias("proj_first"),
        dround(
            F.aggregate(
                F.zip_with(y, idx, lambda v, i: v * i.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("proj_posdigest"),
        dround(
            F.sqrt(
                F.aggregate(
                    F.transform(y, lambda v: v * v),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("proj_norm"),
    )


# ---------------------------------------------------------------------------
# heavy hitters (Misra–Gries)


@register(
    "q_freq_heavy_hitters",
    oracle="""
    SELECT event_type,
           COUNT(*) AS exact_cnt,
           CAST(1 AS INTEGER) AS found,
           CAST(1 AS INTEGER) AS est_in_band
    FROM events GROUP BY event_type
    HAVING COUNT(*) > (SELECT COUNT(*) / 65.0 FROM events)
    ORDER BY exact_cnt DESC, event_type
    """,
    tags=("freq", "sketch", "heavy-hitters", "llm-pipeline"),
)
def q_freq_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over event_type (m=64 counters per
    partition — state O(partitions×m), never O(distinct)).

    Verdict oracle built on the MERGEABLE-SUMMARY guarantee, which is
    independent of row order and partitioning: every item with true
    frequency above n/(m+1) must be found, and its estimate must lie
    in [exact − n/(m+1), exact]. BOTH engines restrict to the
    guaranteed-heavy set with the same n/(m+1) threshold derived from
    exact counts (the Spark filter and the oracle's HAVING are the
    same predicate — a fixture whose item falls below the threshold
    drops out of both sides instead of desyncing them), and the
    verdict flags come from the guarantee, with the threshold (not the
    left-join's nullable err_bound) as the band width so a missed item
    really does emit found=0 rather than being silently filtered. The
    decrement path the low-cardinality fixture can't trigger is
    exercised on synthetic high-cardinality data in
    tests/test_scale_ops.py.
    """
    from skopje_spark.operators.freq import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    hh = heavy_hitters(ev, "event_type", m=64)
    # tiny per-type table, checkpointed so the threshold aggregate
    # reuses it instead of re-scanning events
    exact = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=True)
    )
    thresh = exact.agg(
        (F.sum("exact_cnt") / F.lit(65.0)).alias("__thresh")
    )
    joined = (
        exact.crossJoin(F.broadcast(thresh))
        .join(hh, exact["event_type"] == hh["item"], "left")
    )
    return (
        joined.filter(F.col("exact_cnt") > F.col("__thresh"))
        .select(
            "event_type",
            "exact_cnt",
            F.col("item").isNotNull().cast("int").alias("found"),
            (
                F.col("item").isNotNull()
                & (F.col("est") <= F.col("exact_cnt"))
                & (F.col("est") >= F.col("exact_cnt") - F.col("__thresh"))
            )
            .cast("int")
            .alias("est_in_band"),
        )
        .orderBy(F.desc("exact_cnt"), "event_type")
    )


# ---------------------------------------------------------------------------
# PageRank


_PR_EDGES_SQL = """
    pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT 'c' || c AS src, 's' || s AS dst FROM pairs
      UNION ALL
      SELECT 's' || s AS src, 'c' || c AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)
"""


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    i_{out} AS (
      SELECT e.dst AS node, SUM(r.rank / d.outdeg) AS inflow
      FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT nodes.node,
             ((1.0 - 0.85) / nn.n + 0.85 * COALESCE(i_{out}.inflow, 0.0)) AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN i_{out} ON nodes.node = i_{out}.node
    )
"""


@register(
    "q_graph_pagerank",
    oracle=f"""
    WITH {_PR_EDGES_SQL},
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
    {_pr_iter_sql('r0', 'r1')},
    {_pr_iter_sql('r1', 'r2')}
    SELECT node, {dround_sql('r2.rank * nn.n', 6)} AS norm_rank
    FROM r2 CROSS JOIN nn
    WHERE node LIKE 's%'
    ORDER BY norm_rank DESC, node LIMIT 15
    """,
    tags=("graph", "pagerank", "iterative"),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-iteration PageRank (d=0.85) over the undirected
    customer–supplier trade graph (distinct pairs from
    orders⋈lineitem, both directions emitted so out-degree ≥ 1 by
    construction — operators/graph.py), reporting the 15 most central
    suppliers with mean-1-normalized ranks.

    Fixed iterations make the result a closed-form composition the
    DuckDB oracle reproduces with one CTE per iteration; inflow sums
    differ only in summation order (dround-absorbed, the repo's
    accepted float-oracle risk class).
    """
    from skopje_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    # checkpoint the HALF-SIZED int pair list (not the doubled string
    # edge list): both edge directions then derive from it as one
    # cheap explode per pass, so the join+distinct runs once and the
    # materialized state is 2 ints/row instead of 2 strings/row —
    # measured ~20% off the whole query next to the union-of-two-
    # projections shape (OPTIMIZATION_r14.md)
    pairs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # INT node ids inside the recurrence (customer c → 2c, supplier
    # s → 2s+1 — disjoint namespaces by parity): the rank vector is a
    # pure function of the graph structure, so ranks are unchanged,
    # and every per-iteration pass (explode, broadcast-hash probe,
    # partial inflow agg) hashes/compares 8-byte longs instead of
    # building and hashing ~2.3M 'c123'/'s45' strings per pass
    # (guide §2.3 "narrower types"). The 's%' labels the oracle
    # compares against are reconstructed on the 15-row output only.
    cn = F.col("c").cast("long") * 2
    sn = F.col("s").cast("long") * 2 + 1
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(cn.alias("src"), sn.alias("dst")),
                F.struct(sn.alias("src"), cn.alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # both directions emitted above => out-degree >= 1 by construction;
    # edges is a narrow map over the checkpointed pairs, so the
    # operator-side edge materialization would only re-copy it.
    # checkpoint_interval=0: at 2 fixed iterations the uncheckpointed
    # plan is shallow, and skipping the two per-iteration
    # materialization barriers removes their job-submission + AQE
    # replan gaps (measured ~0.5 s of driver idle between stages).
    ranks = pagerank(
        edges,
        iters=2,
        damping=0.85,
        validate=False,
        materialize_edges=False,
        checkpoint_interval=0,
        # both directions emitted -> indeg >= 1 everywhere; skips the
        # per-iteration nodes join + broadcast (bit-identical ranks)
        symmetric=True,
    )
    return (
        ranks.filter(F.col("node") % 2 == 1)
        .select(
            F.concat(
                F.lit("s"), ((F.col("node") - 1) / 2).cast("long")
            ).alias("node"),
            dround(F.col("norm_rank"), 6).alias("norm_rank"),
        )
        .orderBy(F.desc("norm_rank"), "node")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# distribution window functions


@register(
    "q_window_distribution",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           NTILE(4) OVER w AS price_quartile,
           {dround_sql('PERCENT_RANK() OVER w', 9)} AS pct_rank,
           {dround_sql('CUME_DIST() OVER w', 9)} AS cume
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber)
    """,
    tags=("window", "distribution", "ntile"),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile / percent_rank /
    cume_dist — per return flag over price. The ORDER BY carries the
    full unique key (orderkey, linenumber tiebreak): ntile assigns by
    ROW position, so any tie left unordered would make bucket
    membership scheduling-dependent; with a total order all three
    functions are exact rational arithmetic both engines agree on.
    """
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).alias("price_quartile"),
        dround(F.percent_rank().over(w), 9).alias("pct_rank"),
        dround(F.cume_dist().over(w), 9).alias("cume"),
    )


# ---------------------------------------------------------------------------
# corpus-LM document scoring


@register(
    "q_text_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM toks)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           {dround_sql('AVG(-ln(freq.c / tot.t))', 6)} AS mean_nll
    FROM toks JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "quality", "lm", "llm-pipeline"),
)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring (the CCNet-style quality signal): a
    corpus unigram model p(w) = count/total, each document scored by
    its mean negative log-probability — low = common boilerplate-ish
    text, high = rare-token (or noisy) text.

    Scale: one groupBy(token) builds the model (shuffle ∝ vocabulary,
    map-side combined); scoring joins tokens to the model on the token
    key — both sides already partitioned by the same key after the
    build, and at 100 TB the model can instead be broadcast after a
    min-count cut. No UDF anywhere; ln/avg differences are
    dround-absorbed.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    # vocab-sized; materialized once so the total and the scoring join
    # below don't each recompute it (each recompute = one more full
    # corpus scan — Spark does not share common subplans across jobs)
    freq = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # total token count derived from the vocab-sized freq table, NOT a
    # third scan of the corpus: sum(c) == count(tokens) by construction
    total = freq.agg(F.sum("c").cast("double").alias("t"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            dround(F.avg(-F.log(F.col("c") / F.col("t"))), 6).alias("mean_nll"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch point queries


@register(
    "q_freq_cms_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) AS exact_cnt,
           CAST(1 AS INTEGER) AS est_ge_exact,
           CAST(1 AS INTEGER) AS est_in_band
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("freq", "sketch", "cms", "incremental"),
)
def q_freq_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries (operators/freq.py:cms_build):
    per-user event counts estimated from a depth=4 × width=2048 cell
    table built INCREMENTALLY — one sketch per event_id-parity slice
    (two independent "loads"), merged by cell-wise summation — then
    point-queried for every user_id.

    Verdict recipe: est >= exact is CMS's deterministic one-sided
    guarantee (collisions only add), asserted per user. The upper
    band est <= exact + 8·N/width is probabilistic per hash row
    (Markov: P[row overcount >= 8·N/width] <= 1/8) and the min over 4
    independent rows makes the per-user failure <= 1/4096; measured
    at the fixtures the estimates are EXACT (150 distinct users never
    collide in all 4 rows of a 2048-wide sketch), so the band carries
    orders-of-magnitude headroom. Exact counts ride along so the
    driver hash pins real frequencies, not just flags.
    """
    from skopje_spark.operators.freq import cms_build, cms_merge, cms_query

    depth, width = 4, 2048
    ev = load_table(spark, sf_dir, "events")
    first = cms_build(
        ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0),
        "user_id",
        depth=depth,
        width=width,
    )
    second = cms_build(
        ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1),
        "user_id",
        depth=depth,
        width=width,
    )
    cms = cms_merge(first, second).localCheckpoint(eager=True)

    # per-user exact counts double as the probe set: checkpointed so
    # the total, the probe fan-out, and the verdict join all reuse one
    # events aggregation instead of three scans
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=True)
    )
    n_total = exact.agg(F.sum("exact_cnt").alias("__n"))
    est = cms_query(
        cms, exact.select("user_id"), "user_id", depth=depth, width=width
    )
    return (
        exact.join(est, "user_id")
        .crossJoin(F.broadcast(n_total))
        .select(
            "user_id",
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).cast("int").alias("est_ge_exact"),
            (
                F.col("est")
                <= F.col("exact_cnt") + F.lit(8.0) * F.col("__n") / F.lit(float(width))
            )
            .cast("int")
            .alias("est_in_band"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Bigram LM document scoring


@register(
    "q_text_bigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
      FROM toks,
           UNNEST(CASE WHEN len(ts) >= 2 THEN range(1, len(ts))
                       ELSE []::BIGINT[] END) AS t(i)
    ),
    bg  AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
    ctx AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY 1),
    voc AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT unnest(ts) AS tok FROM toks)
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           {dround_sql('AVG(-ln((c12 + 0.5) / (c1 + 0.5 * v)))', 6)} AS mean_nll2
    FROM pairs JOIN bg USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN voc
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "quality", "lm", "bigram", "llm-pipeline"),
)
def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring — the second-order refinement of
    q_text_unigram_logprob (the CCNet/KenLM-style perplexity filter
    distilled to SQL-expressible form): corpus model
    p(w2|w1) = (c(w1,w2) + 0.5) / (c(w1) + 0.5·V) (add-half
    smoothing over vocabulary V), each document scored by the mean
    negative log-probability of its bigrams. Word-salad and
    shuffled/templated text scores high even when its unigram mix
    looks natural — the signal n-gram quality filters actually use.

    Scale shape: bigram formation is a NARROW map (the token array
    zipped with its own tail — no window, no per-doc shuffle);
    the model is one groupBy(w1, w2) with map-side combine; scoring
    re-joins pairs to the model on the same (w1, w2) key. The
    denominator table c(w1) is derived from the bigram model (sum
    over w2), never from a second corpus pass, and V rides along as a
    broadcast scalar. No UDF anywhere; ln/avg engine differences are
    dround-absorbed.
    """
    d = load_table(spark, sf_dir, "documents")
    ts = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    arr = d.select("doc_id", ts.alias("ts")).filter(F.size("ts") >= 2)
    pairs = arr.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))

    # bigram model: vocab²-bounded, materialized once (the ctx table
    # and the scoring join both reuse it)
    bg = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    ctx = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    voc = (
        d.select(F.explode(ts).alias("tok"))
        .agg(F.count_distinct("tok").cast("double").alias("v"))
    )
    return (
        pairs.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(voc))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            dround(
                F.avg(
                    -F.log(
                        (F.col("c12") + F.lit(0.5))
                        / (F.col("c1") + F.lit(0.5) * F.col("v"))
                    )
                ),
                6,
            ).alias("mean_nll2"),
        )
        .orderBy("doc_id")
    )


def _ppr_iter_sql(prev: str, out: str) -> str:
    return f"""
    i_{out} AS (
      SELECT e.dst AS node, SUM(r.rank / d.outdeg) AS inflow
      FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT nodes.node,
             ((1.0 - 0.85) * p.pv + 0.85 * COALESCE(i_{out}.inflow, 0.0)) AS rank
      FROM nodes JOIN p ON nodes.node = p.node
      LEFT JOIN i_{out} ON nodes.node = i_{out}.node
    )
"""


@register(
    "q_graph_ppr",
    oracle=f"""
    WITH {_PR_EDGES_SQL},
    seeds AS (
      SELECT node FROM nodes WHERE node LIKE 'c%' ORDER BY node LIMIT 3
    ),
    ks AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM seeds),
    p AS (
      SELECT nodes.node,
             CASE WHEN seeds.node IS NOT NULL THEN 1.0 / ks.k ELSE 0.0 END AS pv
      FROM nodes CROSS JOIN ks LEFT JOIN seeds ON nodes.node = seeds.node
    ),
    r0 AS (SELECT node, pv AS rank FROM p),
    {_ppr_iter_sql('r0', 'r1')},
    {_ppr_iter_sql('r1', 'r2')}
    SELECT node, {dround_sql('r2.rank * nn.n', 6)} AS norm_rank
    FROM r2 CROSS JOIN nn
    WHERE node LIKE 's%'
    ORDER BY norm_rank DESC, node LIMIT 15
    """,
    tags=("graph", "pagerank", "personalized", "iterative"),
)
def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.py:pagerank with
    seeds): teleport restricted to the 3 lexicographically-first
    customer nodes, ranking suppliers by PROXIMITY to those seed
    customers rather than global centrality — the TrustRank-style
    propagate-from-vetted-seeds signal used to score crawl/graph data
    from a trusted whitelist. Same per-iteration cost as uniform
    PageRank (the teleport vector is a literal membership test);
    oracle chains one CTE per iteration with the seeded teleport
    term."""
    from skopje_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = [
        r["src"]
        for r in edges.filter(F.col("src").startswith("c"))
        .select("src")
        .distinct()
        .orderBy("src")
        .limit(3)
        .collect()
    ]
    ranks = pagerank(edges, iters=2, validate=False, seeds=seeds)
    return (
        ranks.filter(F.col("node").startswith("s"))
        .select("node", dround(F.col("norm_rank"), 6).alias("norm_rank"))
        .orderBy(F.col("norm_rank").desc(), "node")
        .limit(15)
    )
