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
from arangodb_java_parquet_spark.queries import evaluation3  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import advanced3  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import evaluation4  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import stat_tests  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import graph_ts  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import robust_stats  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import text_stats  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import density_eval  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import ts_stats  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import resampling  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import robust_stats2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import forecast2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import eval_storage  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import diversity  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import survival2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import residual_diag  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import source_overlap  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import forecast_bench  # noqa: F401,E402

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
    # ROUND-12 ROTATION (VERDICT r11 next-round #1): all 50 slots are
    # names with NO driver CORRECTNESS row in rounds 1-11 (computed from
    # the committed CORRECTNESS_r*.json files — 347 distinct sampled,
    # 129 never-sampled oracle-backed remaining before this round).
    # Cross-section of the remaining families: the full evaluation-
    # harness wave (AUC variants, nonparametrics, agreement, calibration,
    # forecast), the embedding-diagnostics wave (CKA/ZCA/Mahalanobis/
    # TwoNN/alignment), the remaining dedup breadth (SpotSigs, CDC,
    # soft weights, LSH planner — incl. the three entries this round's
    # ADVICE fixes touched, so the driver confirms the fixes), mixture/
    # sampling, graph, time-series, multimodal plumbing, sketches.
    # Cumulative distinct driver-green grows 347 -> ~397 of 486.
    # Previously-green names stay locally harness-checked every round
    # via tools/check_correctness.py (full 486-entry drive).
    #
    # text / vocab statistics
    "vocab_growth_curve", "token_length_histogram",
    "doc_length_by_lang_profile", "lang_purity_by_source",
    "bpe_apply_compression",
    # dedup breadth (SpotSigs + CDC + soft weights + LSH planner)
    "dedup_soft_weights", "dedup_lsh_param_planner", "dedup_cdc_chunking",
    "dedup_spotsigs", "dedup_cluster_quality_spread",
    # mixture / sampling / curation
    "sample_stratified_hash", "sample_language_quota",
    "sample_weighted_ares", "mixture_source_weights",
    "mixture_rebalance_rates", "mixture_data_constrained_epochs",
    # embeddings diagnostics
    "emb_label_stats", "emb_bucket_histogram", "emb_drift_by_label",
    "emb_alignment_uniformity", "emb_linear_cka", "emb_zca_whitening_2d",
    "emb_mahalanobis_outliers_2d", "emb_intrinsic_dim_twonn",
    # evaluation harness (AUC variants, nonparametrics, agreement,
    # calibration, forecast)
    "eval_forecast_accuracy", "eval_bh_fdr_correction",
    "eval_wilcoxon_signed_rank", "eval_auc_macro_ovr", "eval_pinball_loss",
    "eval_icc_2_1", "eval_auc_delong_ci", "eval_mcc_matthews",
    "eval_calibration_spiegelhalter_z", "eval_weighted_kappa",
    # trend / forecast / drift
    "trend_mann_kendall", "forecast_holt_linear",
    "timeseries_classical_decompose", "drift_ks_statistic",
    # graph (incl. this round's capped-default diagnostics)
    "graph_adamic_adar", "graph_edge_triangle_support",
    "graph_rich_club_coefficient",
    # linkage / intervals / privacy
    "linkage_blocking_quality", "intervals_allen_profile",
    "privacy_delta_presence",
    # sketches
    "agg_ams_f2_sketch", "sketch_kmv_distinct_ops",
    # multimodal plumbing (oracle-backed metadata legs)
    "multimodal_binary_meta", "multimodal_format_sniff",
    # clustering quality / scale ops
    "cluster_davies_bouldin", "zonemap_pruning_report",
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
