"""Declared query inventory: every operator from SURVEY.md §2 gets a named
entry with (a) a Spark implementation ``(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent ANSI-SQL DuckDB oracle string.

Determinism contract (the driver hash-compares values): floating-point
aggregates are computed as exact DECIMAL sums and only then cast to DOUBLE,
so result values are bit-identical between Spark and DuckDB regardless of
partitioning / aggregation order. See queries/common.py.
"""

from arangodb_java_parquet_spark.queries.common import QUERIES, ORACLES  # noqa: F401
# Importing the modules registers their queries. Registration order is
# verification order for budgeted harnesses: the core relational surface
# and the LLM-pipeline flagships (dedup / curation / similarity — the
# north-star operators) register FIRST so a time-budgeted driver run
# records them; window/scalar breadth next; the streaming / rows-only
# entries (advanced) last, so budget is never burned on streaming-drive
# fixed costs before the value-checked inventory is covered.
from arangodb_java_parquet_spark.queries import relational  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import relational2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import relational3  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import text_pipeline  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import curation  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import text_pipeline2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import similarity  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import temporal  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import event_analytics  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import partsupp_shapes  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import windows  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import subqueries  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import profiling  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import scalar_extra  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import advanced  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import ir_analytics  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import lifecycle  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import sketches  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import textmatch  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import trend  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import curation2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import scale_ops  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver panel: the verification driver checks exactly the FIRST 50 entries
# of queries() in registration order (fixed-budget panel). The panel below is
# a deliberate cross-section — a TPC-H/relational spine plus one
# representative per flagship capability family (dedup, ANN/similarity,
# curation/quality, decontamination, IR, streaming, SCD2/CDC, temporal joins,
# embeddings, windows) — so every round's driver correctness record samples
# the whole surface, not just whichever module happened to import first.
# Every panel slot MUST carry a DuckDB oracle (asserted at import time and
# by tests/test_registry.py): a rows-only entry in the panel would burn a
# value-checked slot on a permanent "no_oracle".
# ---------------------------------------------------------------------------
DRIVER_PANEL = [
    # relational / TPC-H spine (q5/q9/q21, rollup/grouping-sets,
    # semi/full-outer joins, scalar suites, topk and pushdown probes
    # rotated out this round after driver-green records r1-r4 — all stay
    # locally harness-checked every round)
    "q1_pricing_summary", "q3_shipping_priority",
    "q6_forecast_revenue", "q18_large_orders",
    "agg_moment_stats", "agg_exact_percentiles",
    "agg_hll_portable_estimate", "multimodal_image_decode",
    # dedup family (exact, MinHash+LSH, SimHash, n-gram containment,
    # bloom, connected components, end-to-end funnel)
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_signatures",
    "dedup_containment", "dedup_bloom_prefilter",
    "dedup_cluster_components", "dedup_funnel_survivors", "semdedup_prune",
    # similarity / ANN (+ the round-5 optimized mutual-kNN graph)
    "sim_topk_bruteforce", "sim_topk_lsh_bucketed", "sim_topk_pq_adc",
    "sim_recall_at_k", "emb_mutual_knn_graph",
    # curation / quality / decontamination
    "decontaminate_benchmark_overlap", "decontaminate_semantic",
    "per_source_cap", "quality_filter_rules", "quality_unigram_logprob",
    "pii_redaction", "pack_token_sequences", "train_test_split_hash",
    # IR / text
    "ir_bm25_score", "token_pmi_collocations",
    # streaming (batch-equivalence drives with full value oracles)
    "stream_error_monitor", "stream_cms_maintenance",
    "stream_session_windows",
    # lifecycle, temporal joins, embeddings, windows
    "scd2_merge_customers", "snapshot_cdc_diff", "join_range_binned",
    "join_asof_backward", "emb_gram_matrix", "window_session_native",
    "window_rolling_median", "intervals_merge_islands",
    # round-5 first-time flagships: relational ML, graph, trend, sampling,
    # profiling — none of these 10+ entries has ever had a driver row
    "kmeans_fixed_rounds", "logistic_irls_fit", "als_factorization",
    "sample_weighted_topk", "graph_label_propagation",
    "theil_sen_trend", "cusum_change_point", "histogram_equidepth",
]


def _apply_panel_order() -> None:
    missing = [n for n in DRIVER_PANEL if n not in QUERIES]
    unoracled = [n for n in DRIVER_PANEL if n in QUERIES and n not in ORACLES]
    if missing or unoracled:
        raise RuntimeError(
            f"DRIVER_PANEL drift: missing={missing} no_oracle={unoracled}")
    ordered = {n: QUERIES[n] for n in DRIVER_PANEL}
    for n, fn in QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_panel_order()
