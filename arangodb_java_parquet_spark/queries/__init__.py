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
from arangodb_java_parquet_spark.queries import changepoint  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import stat_tests2  # noqa: F401,E402

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
# PANEL-EXHAUSTION POLICY (decided r13, per VERDICT r12 #6): while ANY
# oracle-backed entry has never appeared in a committed CORRECTNESS_r*.json,
# every panel slot MUST be never-sampled (enforced by
# tests/test_registry.py::test_panel_rotation_policy, which recomputes the
# never-sampled set from the committed record files at test time). Once the
# never-sampled pool is empty (~round 15 at 50 slots/round over the current
# 547-entry registry), rotation switches to OLDEST-GREEN-FIRST: re-sample
# the 50 entries whose most recent driver-green row is oldest (ties broken
# by registry name), so the external signal continuously re-validates the
# whole surface instead of freezing on one historical pass.
DRIVER_PANEL = [
    # ROUND-13 ROTATION (VERDICT r12 next-round #1): all 50 slots are
    # names with NO driver CORRECTNESS row in rounds 1-12 (computed from
    # the committed CORRECTNESS_r*.json files — 397 distinct sampled,
    # 140 never-sampled oracle-backed remaining before this round).
    # Cross-section of the remaining families: the r12 session-2 waves
    # (classical stats, time-series diagnostics, drift, survival, DQ
    # audits), the rank-metric evaluation tier (nDCG/MRR/ERR), text/vocab
    # statistics, graph centralities, the first streaming + multimodal
    # decode entries ever panel-sampled, and the three entries this
    # round's ADVICE fixes touched (text_distinct_n,
    # drift_cramer_von_mises, graph_hits_scores) so the driver confirms
    # the fixes. Cumulative distinct driver-green grows 397 -> ~447 of
    # 547; ~90 never-sampled remain (two rotations to exhaustion).
    # Previously-green names stay locally harness-checked every round
    # via tools/check_correctness.py (full 547-entry drive).
    #
    # text / vocab statistics (incl. ADVICE-fixed text_distinct_n)
    "text_yules_k", "vocab_heaps_law_fit", "vocab_chao1_ace",
    "token_fertility_by_lang", "text_fightin_words", "text_distinct_n",
    # IR / language-model scoring
    "ir_query_expansion_prf", "ir_query_likelihood_jm",
    # graph centralities (incl. ADVICE-fixed graph_hits_scores)
    "graph_hits_scores", "graph_eigenvector_centrality",
    "graph_local_clustering", "graph_assortativity",
    # evaluation harness: rank metrics + nonparametrics + agreement
    "eval_ndcg_at_k", "eval_mean_reciprocal_rank",
    "eval_expected_reciprocal_rank", "eval_mann_whitney_u",
    "eval_kruskal_wallis", "eval_welch_ttest", "eval_jarque_bera",
    "eval_gwets_ac1",
    # classical regression / correlation diagnostics
    "stats_partial_correlation", "stats_runs_test", "stats_durbin_watson",
    # drift family (incl. ADVICE-fixed drift_cramer_von_mises)
    "drift_wasserstein_1d", "drift_qq_deciles", "drift_cramer_von_mises",
    # time-series diagnostics / forecast
    "timeseries_strength_measures", "timeseries_ljung_box",
    "timeseries_pacf", "forecast_holt_winters", "forecast_naive_benchmarks",
    # embedding diagnostics
    "emb_procrustes_2d", "emb_lof_outliers", "emb_jl_distortion",
    # survival analysis
    "survival_log_rank", "survival_nelson_aalen",
    # data-quality audits
    "dq_benford_law", "dq_anderson_darling_uniform",
    "dq_rle_dictionary_audit",
    # multimodal decode (first panel sample of the decode legs)
    "multimodal_image_features", "multimodal_audio_codec_profile",
    # streaming (first panel sample of the streaming surface)
    "stream_windowed_counts", "stream_dedup_exact",
    "stream_topk_event_types",
    # user / event analytics
    "rfm_segmentation", "rfm_migration_matrix",
    "markov_next_event_accuracy", "attribution_position_based",
    # dataset governance / storage-layout ops
    "dataset_datasheet", "compaction_bin_plan",
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
