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
from arangodb_java_parquet_spark.queries import ann_stored  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import advanced2  # noqa: F401,E402

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
    # ROUND-6 ROTATION (VERDICT r5 next-round #1): all 50 slots are names
    # with NO driver CORRECTNESS row in any of rounds 1-5 — converting the
    # never-sampled long tail (222 entries) to driver-green. The r1-r5
    # green names (TPC-H spine, dedup/ANN/streaming flagships) stay
    # locally harness-checked every round via tools/check_correctness.py.
    #
    # TPC-H spine never sampled before
    "q2_min_cost_supplier", "q4_order_priority", "q15_top_supplier",
    "q17_small_quantity_revenue", "q20_excess_inventory_suppliers",
    "q22_global_sales_opportunity",
    # aggregation breadth
    "agg_corr_matrix", "agg_linear_regression", "agg_bitmap_distinct",
    "agg_weighted_percentile", "rollup_share_of_parent",
    # window frames
    "window_range_frame", "window_distinct_in_frame",
    "window_time_range_frame",
    # dedup long tail (fingerprints, multiprobe, spans, tuning, ensemble,
    # incremental, cross-source, quality-aware resolution)
    "dedup_fingerprint", "dedup_simhash_hamming2", "dedup_substring_span",
    "dedup_lsh_tuning_curve", "dedup_ensemble_votes",
    "dedup_incremental_batch", "dedup_cross_source_matrix",
    "dedup_keep_best_quality",
    # text / quality / language-ID / BPE / IR
    "text_quality_stats", "text_lang_id", "langid_trigram_confusion",
    "bpe_pair_merge_fit", "quality_composite_gate", "ir_inverted_index",
    # embeddings / similarity / graph
    "emb_near_dup_pairs", "emb_random_projection", "sim_topk_ivf_rulebased",
    "sim_pq_encode", "graph_pagerank_simdocs",
    # temporal joins / event analytics
    "join_asof_nearest", "join_range_interval", "sessionize_events",
    "cohort_retention", "funnel_conversion", "attribution_last_touch",
    # portable sketches
    "agg_hll_set_algebra", "rolling_hll_distinct_users",
    "cms_join_size_estimate",
    # curation / sampling / privacy
    "curriculum_interleave", "mixture_kl_divergence", "pii_pseudonymize",
    "robust_scale_features", "source_keep_rate_wilson",
    # statistical diagnostics
    "benford_first_digit", "vocab_overlap_matrix",
    "psi_distribution_stability",
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
