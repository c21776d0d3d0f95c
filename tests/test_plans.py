"""Plan-shape assertions: the 100 TB scale contract, pinned in CI.

Row-level tests can't see a lost pushdown or a join that degenerated
to a cartesian product — these tests read the physical plan and fail
if a scale-critical property regresses."""

from __future__ import annotations

import pytest

from skopje_spark.plans import (
    has_codegen,
    join_strategies,
    plan_text,
    pushed_filters,
    scan_schemas,
)
from skopje_spark.queries import load_all

REGISTRY = load_all()


def _df(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = _df(spark, sf_dir, "q1_pricing_summary")
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    schema = " ".join(scan_schemas(df))
    # pruned: the scan must NOT read the unused join keys
    assert "l_orderkey" not in schema and "l_partkey" not in schema
    assert has_codegen(df)


def test_q6_all_predicates_pushed(spark, sf_dir):
    df = _df(spark, sf_dir, "q6_forecast_revenue")
    pushed = " ".join(pushed_filters(df))
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, f"{c} not pushed to scan"


def test_dimension_joins_broadcast(spark, sf_dir):
    """q5: region/nation/customer/supplier dims must broadcast — a
    shuffle of lineitem against a 5-row dim is the classic scale bug."""
    df = _df(spark, sf_dir, "q5_region_revenue")
    strats = join_strategies(df)
    assert strats, "no joins found in q5 plan"
    assert "CartesianProduct" not in strats
    assert "BroadcastHashJoin" in strats


def test_no_cartesian_anywhere(spark, sf_dir):
    """No catalog query may contain a CartesianProduct node. (The
    1-row-broadcast crossJoins in similarity scoring legitimately plan
    as BroadcastNestedLoopJoin — bounded by the broadcast side — and
    are allowed.)"""
    offenders = []
    for name, qd in REGISTRY.items():
        try:
            plan = plan_text(qd.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surface plan bugs
            offenders.append(f"{name}: explain failed: {e}")
            continue
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_asof_join_is_single_shuffle_no_join(spark, sf_dir):
    """The asof composition must not contain any join operator — its
    whole point is one shuffle + one window."""
    from skopje_spark.plans import num_shuffles

    df = _df(spark, sf_dir, "q_join_asof")
    assert join_strategies(df) == []
    # exactly: 1 key shuffle for the window + 1 range shuffle for the
    # presentation orderBy
    assert num_shuffles(df) <= 2


def test_topk_uses_ordered_limit_not_global_sort(spark, sf_dir):
    df = _df(spark, sf_dir, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan_text(df)


def test_broadcast_join_hint_respected(spark, sf_dir):
    df = _df(spark, sf_dir, "q_join_inner_broadcast")
    assert "BroadcastHashJoin" in join_strategies(df)


@pytest.mark.parametrize("name", ["q_dedup_minhash_lsh", "q_text_quality"])
def test_llm_operators_stay_in_codegen(spark, sf_dir, name):
    """Dedup/text hot paths are built-in expressions — they must keep
    whole-stage codegen (a Python UDF in the middle would break it)."""
    assert has_codegen(_df(spark, sf_dir, name))


def test_partition_pruning_on_partitioned_sink(spark, tmp_path):
    """A partitionBy'd dataset scanned with a partition predicate must
    prune at the file-index level (PartitionFilters), reading only the
    matching directory — the mechanism date-partitioned 100 TB tables
    rely on."""
    from skopje_spark.sinks import parquet_sink

    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 5 AS STRING) AS shard"
    )
    out = str(tmp_path / "parts")
    parquet_sink(df, out, mode="overwrite", partition_by=["shard"])
    scan = spark.read.parquet(out).filter("shard = '3'")
    part_filters = [
        line.strip()
        for line in plan_text(scan).splitlines()
        if line.strip().startswith("PartitionFilters:")
    ]
    assert part_filters and "shard" in part_filters[0]
    assert "= 3" in part_filters[0] or "(shard" in part_filters[0]
    assert scan.count() == 200


def test_banded_range_join_is_hash_not_nested_loop(spark, sf_dir):
    """The banded formulation must plan as hash/sort-merge equi-joins —
    no BroadcastNestedLoopJoin, no CartesianProduct (the whole point
    versus the naive q_join_range)."""
    df = _df(spark, sf_dir, "q_join_range_banded")
    strats = set(join_strategies(df))
    assert "CartesianProduct" not in strats
    assert "BroadcastNestedLoopJoin" not in strats


def test_group_cap_pushes_limit_below_shuffle(spark, sf_dir):
    """cap_per_group must trigger WindowGroupLimit (partial top-k
    before the group-key shuffle) — at scale the cap filters each map
    partition down to ≤cap rows per group before any data moves."""
    df = _df(spark, sf_dir, "q_sample_group_cap")
    assert "WindowGroupLimit" in plan_text(df)


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram set must broadcast: the (100 TB) training
    side stays partition-local through the contamination join."""
    df = _df(spark, sf_dir, "q_contamination_ngram")
    assert "BroadcastHashJoin" in join_strategies(df) or "BroadcastHashJoin" in plan_text(df)


def test_chunking_is_narrow(spark, sf_dir):
    """q_chunk_documents must be a pure map plan: zero shuffles, whole
    text column pruning aside, and codegen throughout."""
    from skopje_spark.plans import num_shuffles

    df = _df(spark, sf_dir, "q_chunk_documents")
    assert num_shuffles(df) == 0
    assert has_codegen(df)
    schema = " ".join(scan_schemas(df))
    assert "lang" not in schema and "source" not in schema  # pruned


def test_passage_dedup_single_shuffle(spark, sf_dir):
    """q_dedup_passage shuffles digests only: the groupBy exchange plus
    the second exchange Spark plans for the distinct aggregate
    (countDistinct doc_id) — and the document text must not cross
    either."""
    from skopje_spark.plans import num_shuffles

    df = _df(spark, sf_dir, "q_dedup_passage")
    assert num_shuffles(df) <= 2
    txt = plan_text(df)
    ex = txt[txt.index("Exchange"):]
    first_exchange_line = ex.splitlines()[0]
    assert "text" not in first_exchange_line  # only digests shuffle


def test_packing_has_no_single_partition_window(spark, sf_dir):
    """The packing offset must come from the two-pass prefix sum — a
    plan containing a partition-less Window would collapse the corpus
    onto one task at any scale. A SinglePartition exchange is legal
    ONLY in the documented small-input collapse (global_prefix_sum
    drops to one bucket when the measured row count is at most
    _MIN_BUCKET_ROWS, where per-bucket fixed costs dominate); above
    the threshold the plan must fan out across buckets — asserted on
    a synthetic frame big enough to clear it, independent of sf_dir."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.packing import (
        _MIN_BUCKET_ROWS,
        global_prefix_sum,
    )
    from skopje_spark.tables import load_table

    # the gate must mirror the row count each query ACTUALLY feeds to
    # global_prefix_sum (r14 advisor note): both feed the full
    # documents table today (q_pack_sequences: every document's token
    # count; q_shuffle_deterministic: every doc_id) — expressed here as
    # per-query input builders so a future query change breaks THIS
    # line instead of silently desyncing the gate.
    docs = load_table(spark, sf_dir, "documents")
    prefix_sum_input_rows = {
        "q_pack_sequences": docs.count(),
        "q_shuffle_deterministic": docs.select("doc_id").count(),
    }
    for name, n_in in prefix_sum_input_rows.items():
        txt = plan_text(_df(spark, sf_dir, name))
        assert "Window" not in txt, f"{name} uses a global window"
        if n_in > _MIN_BUCKET_ROWS:
            assert "SinglePartition" not in txt, f"{name} funnels to one task"

    # scale shape: any input above one bucket's rows must never funnel
    big = spark.range(0, _MIN_BUCKET_ROWS * 4).select(
        F.col("id").alias("k"), F.lit(3).alias("w")
    )
    ps = global_prefix_sum(big, order_col="k", weight_col="w")
    txt = plan_text(ps)
    assert "Window" not in txt, "prefix sum uses a global window"
    assert "SinglePartition" not in txt, "prefix sum funnels to one task"


def test_batch_topk_one_exchange_after_partial_limit(spark, sf_dir):
    """cosine_topk_batch: the corpus is scored in place (MapInPandas
    directly over the scan), per-partition candidates are pruned by a
    PARTIAL WindowGroupLimit before the only Exchange, and the scan
    reads just (id, vector). The one shuffle moves M×partitions×k
    candidate rows — never the corpus."""
    from skopje_spark.queries import load_all

    df = load_all()["q_similarity_batch_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "struct<vec_id:bigint,embedding:array<float>>" in plan


def test_sketch_shuffle_carries_partial_sketches(spark, sf_dir):
    """Sketch-state queries must combine map-side: the shuffle carries
    partial HLL/KLL buffers (partial_hll_sketch_agg /
    partial_kll_sketch_agg below the Exchange), never raw values."""
    from skopje_spark.queries import load_all

    reg = load_all()
    p1 = (
        reg["q_sketch_incremental_distinct"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_hll_sketch_agg" in p1, p1
    assert "partial_hll_union_agg" in p1, p1
    p2 = (
        reg["q_sketch_quantile_merge"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_kll_sketch_agg_double" in p2, p2


def test_round6_narrow_kernels_no_shuffle(spark, sf_dir):
    """The compression and chunking kernels must stay zero-Exchange
    whole-stage-codegen maps over pruned scans — their entire 100 TB
    value is that they are free to apply on a write path."""
    for name, cols in [
        ("q_embed_quantize_int8", ("vec_id", "embedding")),
        ("q_embed_random_projection", ("vec_id", "embedding")),
        ("q_chunk_tokens", ("doc_id", "text")),
    ]:
        df = _df(spark, sf_dir, name)
        txt = plan_text(df)
        assert "Exchange" not in txt, (name, txt)
        schema = " ".join(scan_schemas(df))
        for c in cols:
            assert c in schema, (name, c)
        # pruned: no unrelated fixture column in any scan
        assert "label" not in schema and "lang" not in schema, (name, schema)


def test_unigram_logprob_single_corpus_scan(spark, sf_dir):
    """The corpus is read exactly once: the vocab freq table is
    materialized, so neither the total-count aggregate nor the
    scoring join re-derives it (each re-derivation = one more full
    corpus scan)."""
    df = _df(spark, sf_dir, "q_text_unigram_logprob")
    assert plan_text(df).count("ReadSchema") == 1, plan_text(df)


def test_bigram_logprob_no_python_and_pruned_scan(spark, sf_dir):
    """Bigram formation must be the narrow array-zip map (no Python
    anywhere in the plan) over a text-only pruned scan; the model
    joins are hash joins on (w1, w2) — no cartesian, no broadcast of
    the corpus side."""
    df = _df(spark, sf_dir, "q_text_bigram_logprob")
    txt = plan_text(df)
    assert "Python" not in txt, txt
    assert "CartesianProduct" not in txt, txt
    schema = " ".join(scan_schemas(df))
    assert "text" in schema and "label" not in schema, schema


def test_cms_shuffle_is_partially_aggregated(spark, sf_dir):
    """The CMS build's groupBy(r, bucket) must partial-aggregate
    map-side — that is what bounds the shuffle at
    partitions × depth × width rows regardless of input skew."""
    from skopje_spark.operators.freq import cms_build
    from skopje_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    txt = plan_text(cms_build(ev, "user_id"))
    # partial_count before the exchange, final after it
    assert "partial_count" in txt, txt
    assert txt.index("partial_count") > txt.index("Exchange") or (
        "HashAggregate" in txt
    ), txt


def test_span_coverage_never_pairs_documents(spark, sf_dir):
    """dup_span_coverage joins hash->df and doc->coverage — never a
    doc×doc pair space: no cartesian, no self-join fan-out beyond the
    positioned-gram explode, and every join is an equi hash/SMJ."""
    df = _df(spark, sf_dir, "q_dedup_span_coverage")
    txt = plan_text(df)
    assert "CartesianProduct" not in txt, txt
    assert "BroadcastNestedLoopJoin" not in txt, txt


def test_kmv_state_partials_precede_tiny_topk(spark):
    """kmv_state's plan: Arrow partials (bounded k-min per partition)
    feed a global TakeOrdered/limit over <= partitions × k rows — the
    raw column never shuffles."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.sketches import kmv_state

    df = spark.range(0, 10000).select(F.col("id").alias("v"))
    txt = plan_text(kmv_state(df, "v", k=64))
    assert "ArrowEvalPython" in txt or "MapInPandas" in txt, txt
    assert "TakeOrderedAndProject" in txt or "GlobalLimit" in txt, txt


def test_join_size_estimator_prunes_to_key_column(spark, sf_dir):
    """The sampled scans must read ONLY the join key — reading fat
    rows to count keys would scale the estimator with row width."""
    from skopje_spark.operators.estimate import sampled_join_size

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = sampled_join_size(o, l, "o_orderkey", "l_orderkey", rate=0.1)
    for schema in scan_schemas(df):
        assert "o_totalprice" not in schema and "l_extendedprice" not in schema
    assert "CartesianProduct" not in plan_text(df)


def test_ivm_minmax_refresh_joins_broadcast(spark, sf_dir):
    """The touched-group semi-join and refresh joins must broadcast —
    the group list is tiny by contract; shuffling the new snapshot
    against it would reintroduce the full-refresh cost IVM avoids."""
    df = REGISTRY["q_ivm_agg_update"].fn(spark, sf_dir)
    strats = join_strategies(df)
    assert "CartesianProduct" not in strats
    assert any("Broadcast" in s for s in strats)


def test_fuzzy_match_no_cartesian_and_codegen(spark, sf_dir):
    """Blocked linkage must plan as an equi-join on the block key
    (never a cartesian verify-everything), with levenshtein inside
    codegen, not a UDF stage."""
    df = REGISTRY["q_fuzzy_match_blocked"].fn(spark, sf_dir)
    strats = join_strategies(df)
    assert strats and "CartesianProduct" not in strats
    assert has_codegen(df)
    assert "pythonUDF" not in plan_text(df)


def test_lsh_probe_recurring_plan_reads_no_text(spark, tmp_path):
    """The persisted-LSH probe's RETURNED plan — the per-ingest
    recurring cost — must touch only the index's narrow band/sig
    tables: no document text column in any scan schema (the batch is
    shingled exactly once, at probe-call time, into a checkpoint), and
    no CartesianProduct."""
    from skopje_spark.operators.dedup import lsh_index_probe, lsh_index_write

    docs = spark.createDataFrame(
        [(i, f"some repeated words number {i} " * 5) for i in range(20)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    lsh_index_write(docs.filter("doc_id % 2 = 0"), path)
    probe = lsh_index_probe(docs.filter("doc_id % 2 = 1"), path)
    p = plan_text(probe)
    assert "CartesianProduct" not in p
    for schema in scan_schemas(probe):
        assert "text" not in schema, f"corpus text read on probe path: {schema}"


def test_lsh_tuning_report_is_pure_aggregation(spark):
    """The geometry sweep must contain no join operator at all — each
    geometry is one bucket aggregate over the (checkpointed) signature
    frame, unioned."""
    from skopje_spark.operators.dedup import lsh_tuning_report

    docs = spark.createDataFrame(
        [(i, f"text body {i} with shared phrases " * 3) for i in range(12)],
        "doc_id long, text string",
    )
    rep = lsh_tuning_report(docs)
    assert join_strategies(rep) == []
    assert "CartesianProduct" not in plan_text(rep)


def test_dv_read_broadcasts_vectors_and_keeps_clean_fast_path(spark, tmp_path):
    """DV-applied versioned read (sinks/versioned.py:_read_entries):
    small deletion vectors must join as a BROADCAST anti-join (never a
    cartesian, never a sort-merge for kilobyte vectors), and a table
    with NO vectors must plan a plain parquet scan with zero joins."""
    from pyspark.sql import functions as F

    from skopje_spark.plans import join_strategies, plan_text
    from skopje_spark.sinks.versioned import (
        versioned_delete,
        versioned_read,
        versioned_write,
    )

    path = str(tmp_path / "dvplan")
    df = spark.range(0, 2000).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 3).alias("v")
    )
    versioned_write(df.repartitionByRange(4, "k"), path)
    clean = versioned_read(spark, path)
    assert join_strategies(clean) == []  # pristine fast path

    versioned_delete(spark, path, "k % 10 = 1")
    dirty = versioned_read(spark, path)
    strats = join_strategies(dirty)
    plan = plan_text(dirty)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in strats  # vectors broadcast
    assert "LeftAnti" in plan  # applied as an anti-join on row identity


def test_webtext_filters_are_pure_codegen(spark, sf_dir):
    """The crawl-text curation queries (gopher, C4, HTML extraction)
    must stay JVM-side: no Python evaluation node anywhere, whole-stage
    codegen present, and no shuffle — they are map-only passes that
    must fuse into the scan (the orderBy presentation sort is the one
    allowed exchange)."""
    from skopje_spark.plans import has_codegen, num_shuffles, plan_text

    for name in ("q_gopher_filter", "q_c4_line_filter", "q_html_extract_text"):
        df = _df(spark, sf_dir, name)
        plan = plan_text(df)
        assert "EvalPython" not in plan, f"{name}: Python in the hot path"
        assert has_codegen(df), f"{name}: no codegen span"
        # the only exchange is the presentation orderBy (formatted AQE
        # plans can print it twice); the filters themselves are map-only
        assert num_shuffles(df) <= 2, f"{name}: unexpected shuffle"


def test_change_feed_read_is_scan_only(spark, tmp_path):
    """Serving a recorded change feed must be a plain union of parquet
    scans — no joins, no snapshot diff sneaking back in."""
    from skopje_spark.plans import join_strategies
    from skopje_spark.sinks.versioned import (
        versioned_change_feed,
        versioned_upsert,
        versioned_write,
    )

    path = str(tmp_path / "cdfplan")
    kv = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    versioned_write(kv, path)
    versioned_upsert(
        spark, path,
        spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"),
        ["k"], change_feed=True,
    )
    feed = versioned_change_feed(spark, path, from_version=1)
    assert join_strategies(feed) == []


def test_date_spine_join_is_hash_not_nested_loop(spark, sf_dir):
    """The calendar-spine fact join buckets each order to its week
    ARITHMETICALLY so it plans as a hash equi-join; the naive
    range-predicate spelling would be a BroadcastNestedLoopJoin over
    the whole fact side — unusable at 100 TB."""
    df = _df(spark, sf_dir, "q_recursive_date_spine")
    strats = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strats
    assert "CartesianProduct" not in strats


def test_salted_join_stays_hash_partitioned(spark, sf_dir):
    df = _df(spark, sf_dir, "q_join_skew_salted")
    strats = join_strategies(df)
    assert "CartesianProduct" not in strats
    assert "BroadcastNestedLoopJoin" not in strats
    # the salt column is internal plumbing and must not leak
    assert "__salt" not in df.columns


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """A SQL UDF body must macro-expand into the plan (no Python
    evaluation node) — that inlining is the whole argument for SQL
    UDFs over Python UDFs on the hot path."""
    df = _df(spark, sf_dir, "q_sql_udf_revenue")
    plan = plan_text(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert has_codegen(df)
