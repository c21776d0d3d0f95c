"""skopje_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference ETL
framework (Vostanis/skopje): declarative Extract → Transform → Load
pipelines whose *query layer is Spark SQL itself*, plus the LLM-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) required for 100 TB-scale training-data work.

Public surface (mirrors the reference's small re-export set,
``/root/reference/src/lib.rs:7-13``):

- :mod:`skopje_spark.session`   — SparkSession builder tuned for the engine
- :mod:`skopje_spark.tables`    — fixture/table loaders
- :mod:`skopje_spark.pipeline`  — Extract/Transform/Load node graph
- :mod:`skopje_spark.sources`   — parquet/json/csv/jdbc/http/binary sources
- :mod:`skopje_spark.sinks`     — parquet/jdbc(staging-swap)/console sinks
- :mod:`skopje_spark.operators` — keymap, dedup, similarity, text, asof
- :mod:`skopje_spark.functions` — date/scalar utility functions
- :mod:`skopje_spark.queries`   — the declared operator-demo query registry
"""

from skopje_spark.functions import convert_date, convert_timestamp, schema_of
from skopje_spark.operators.asof import asof_join
from skopje_spark.operators.cdc import apply_changes, scd2_apply, snapshot_diff
from skopje_spark.operators.dedup import (
    contamination_report,
    crawl_ingest_stream,
    dedup_exact,
    dup_span_trim,
    jaccard_pairs,
    lsh_index_append,
    lsh_index_probe,
    lsh_index_stream_sink,
    lsh_index_write,
    lsh_tuning_report,
    minhash_lsh_pairs,
    neardup_clusters,
    semantic_dedup,
    simhash,
)
from skopje_spark.operators.estimate import join_advice, key_sample, sampled_join_size
from skopje_spark.operators.ivm import ivm_apply, ivm_build, ivm_read
from skopje_spark.operators.keymap import keymap_assign, keymap_lookup
from skopje_spark.operators.linkage import (
    fuzzy_pairs_blocked,
    rrf_fuse,
    sorted_neighborhood_pairs,
)
from skopje_spark.operators.quality import psi_drift, psi_drift_binned
from skopje_spark.operators.sampling import leakage_safe_split
from skopje_spark.operators.text import bm25_scores
from skopje_spark.operators.tokenizer import (
    BpeModel,
    bpe_compression_ratio,
    bpe_encode,
    bpe_train,
    token_count_bpe,
)
from skopje_spark.operators.similarity import (
    blocked_neardup_pairs,
    cosine_topk,
    ivf_index_stream_sink,
    ivf_topk,
)
from skopje_spark.pipeline import Pipeline
from skopje_spark.pipeline_live import LiveNode, LivePipeline
from skopje_spark.session import get_spark
from skopje_spark.sinks.versioned import (
    CommitConflict,
    MergeConflict,
    apply_changelog_batch,
    versioned_agg_stats,
    maintenance_report,
    table_partitioning,
    branch_path,
    table_refs,
    versioned_append,
    versioned_branch,
    change_feed_advance,
    change_feed_cursor,
    versioned_change_feed,
    versioned_compact,
    versioned_delete,
    versioned_drop_column,
    versioned_drop_ref,
    versioned_export_manifest,
    versioned_history,
    versioned_partitions,
    versioned_merge,
    versioned_merge_branch,
    versioned_meta,
    versioned_merge_concurrent,
    versioned_publish,
    versioned_purge,
    versioned_read,
    versioned_read_where,
    versioned_replace_where,
    versioned_replicate,
    versioned_restore,
    versioned_refold_refs,
    versioned_tag,
    versioned_update,
    versioned_upsert,
    versioned_value_index,
    versioned_widen_column,
    versioned_write,
    versioned_ivm_view,
    versioned_stream_apply_changes,
    versioned_stream_materialized_view,
)
from skopje_spark.sinks.expect import (
    ExpectationViolation,
    expectation_metrics,
    expectations_write,
)
from skopje_spark.sinks.catalog import (
    attach_catalog,
    catalog_commit,
    catalog_publish,
    catalog_read,
    catalog_tables,
)
from skopje_spark.sources.lakesource import cluster_for_layout
from skopje_spark.sqlfront import versioned_sql
from skopje_spark.tables import load_table, register_views

__all__ = [
    "BpeModel",
    "Pipeline",
    "apply_changes",
    "asof_join",
    "blocked_neardup_pairs",
    "bm25_scores",
    "bpe_compression_ratio",
    "bpe_encode",
    "bpe_train",
    "contamination_report",
    "crawl_ingest_stream",
    "convert_date",
    "convert_timestamp",
    "cosine_topk",
    "dedup_exact",
    "dup_span_trim",
    "fuzzy_pairs_blocked",
    "get_spark",
    "ivf_index_stream_sink",
    "ivf_topk",
    "ivm_apply",
    "ivm_build",
    "ivm_read",
    "join_advice",
    "jaccard_pairs",
    "key_sample",
    "keymap_assign",
    "keymap_lookup",
    "leakage_safe_split",
    "load_table",
    "lsh_index_append",
    "lsh_index_probe",
    "lsh_index_stream_sink",
    "lsh_index_write",
    "lsh_tuning_report",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "psi_drift",
    "psi_drift_binned",
    "register_views",
    "rrf_fuse",
    "sampled_join_size",
    "scd2_apply",
    "schema_of",
    "semantic_dedup",
    "simhash",
    "snapshot_diff",
    "sorted_neighborhood_pairs",
    "token_count_bpe",
    "CommitConflict",
    "LiveNode",
    "LivePipeline",
    "MergeConflict",
    "apply_changelog_batch",
    "maintenance_report",
    "table_partitioning",
    "attach_catalog",
    "branch_path",
    "catalog_commit",
    "catalog_publish",
    "catalog_read",
    "catalog_tables",
    "cluster_for_layout",
    "table_refs",
    "ExpectationViolation",
    "expectation_metrics",
    "expectations_write",
    "versioned_agg_stats",
    "versioned_append",
    "versioned_branch",
    "change_feed_advance",
    "change_feed_cursor",
    "versioned_change_feed",
    "versioned_compact",
    "versioned_delete",
    "versioned_drop_column",
    "versioned_drop_ref",
    "versioned_export_manifest",
    "versioned_history",
    "versioned_partitions",
    "versioned_merge",
    "versioned_merge_branch",
    "versioned_meta",
    "versioned_merge_concurrent",
    "versioned_publish",
    "versioned_purge",
    "versioned_read",
    "versioned_read_where",
    "versioned_replace_where",
    "versioned_replicate",
    "versioned_restore",
    "versioned_tag",
    "versioned_upsert",
    "versioned_widen_column",
    "versioned_write",
    "versioned_ivm_view",
    "versioned_stream_apply_changes",
    "versioned_stream_materialized_view",
]
__version__ = "0.1.0"
