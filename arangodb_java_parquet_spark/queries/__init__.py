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
from arangodb_java_parquet_spark.queries import linkage  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import evaluation  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import evaluation2  # noqa: F401,E402

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
    # ROUND-9 ROTATION (VERDICT r8 next-round #1, two rounds overdue):
    # ALL 50 slots are names with NO driver CORRECTNESS row in rounds
    # 1-8 (computed from the committed CORRECTNESS_r0*.json files), so
    # this round's driver record is 50 first-time names — cumulative
    # distinct driver-green coverage grows from 197 toward the full 377
    # oracle-backed surface. Previously-green names stay locally
    # harness-checked every round via tools/check_correctness.py.
    #
    # relational / aggregation / scalar breadth
    "agg_skewness_kurtosis", "agg_salted_skew", "agg_median_abs_deviation",
    "join_lateral_topn", "scalar_string_funcs2", "scalar_bitwise_ops",
    "scalar_conditional_funcs", "window_nth_value",
    # windows / temporal
    "window_lag_lead", "window_rank_distribution", "window_tumbling_agg",
    "window_hopping_agg", "timeseries_gap_fill", "cumulative_distinct_users",
    # event analytics
    "rollup_cascade_daily", "rolling_wau_distinct", "event_pmi_pairs",
    "daily_revenue_growth", "user_longest_streak", "user_survival_curve",
    # data quality / evaluation
    "dq_constraint_report", "dq_referential_orphans", "dq_schema_drift",
    "dq_header_detail_reconcile", "eval_auc_mann_whitney",
    # dedup / text pipeline (north star)
    "dedup_minhash_signatures", "dedup_simhash_pairs",
    "dedup_lsh_precision_recall", "dedup_ngram_coverage",
    "dedup_sorted_neighborhood", "dedup_ppjoin_prefix",
    "corpus_diversity_minhash", "quality_repetition_signals",
    "dedup_exactsubstr_spans",
    # linkage / curation
    "linkage_fellegi_sunter", "join_fuzzy_name_match", "quality_dsir_weights",
    "curation_bias_audit", "mixture_doremi_step", "privacy_k_anonymity",
    # embeddings / similarity
    "emb_l2_normalize", "emb_knn_outlier_score", "sim_mmr_diversified_topk",
    "kmeans_cluster_purity_nmi", "sim_rbo_vs_exact", "ivf_cell_balance",
    # portable sketches / streaming flagships
    "agg_hll_portable_registers", "agg_quantile_sketch_portable",
    "stream_upsert_merge", "stream_incremental_daily_rollup",
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
