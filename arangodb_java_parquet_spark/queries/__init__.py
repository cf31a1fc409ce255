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
from arangodb_java_parquet_spark.queries import unigram_lm  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import clustering2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import fitting  # noqa: F401,E402

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
# never-sampled pool is empty (r15 on the current cadence: 57 remained
# before r14, 7 will remain after), rotation switches to
# OLDEST-GREEN-FIRST, keyed on the ROUND INDEX of each entry's most recent
# all-green driver row (parsed from the CORRECTNESS_r{N}.json filename;
# an entry that was sampled but never all-green keys as round 0, i.e.
# re-sampled first). Panel = the 50 lowest (last_green_round, name) pairs,
# except that any still-never-sampled leftovers always take the first
# slots. Both regimes are enforced by
# tests/test_registry.py::test_panel_rotation_policy, which recomputes the
# key from the committed record files — EXCLUDING any record produced by
# the current panel itself (key set == panel set), so the driver dropping
# the current round's record into the tree does not retroactively redden
# the round that produced it (ADVICE r13).
DRIVER_PANEL = [
    # ROUND-14 ROTATION (VERDICT r13 next-round #1): all 50 slots are
    # names with NO driver CORRECTNESS row in rounds 1-13 (computed from
    # the committed CORRECTNESS_r*.json files — 446 distinct sampled,
    # 107 never-sampled oracle-backed remaining before this round).
    # Cross-section of the remaining families: the whole remaining
    # streaming surface (stateful totals, stream-stream joins, HLL
    # maintenance, sink round-trip), the remaining multimodal decode legs
    # (audio features, video decode, frame sampling), the r13 statistics
    # waves (Bartlett/Welch-ANOVA/Cook/Hill/Pettitt/theta/Weibull),
    # time-series spectral diagnostics, graph centralities, the rank/ab
    # evaluation tier, and the three entries this round's ADVICE fixes
    # touch (timeseries_sample_entropy, stats_fisher_exact_2x2,
    # ir_query_clarity) so the driver confirms the fixes. Cumulative
    # distinct driver-green grows 446 -> ~496 of 553; 7 never-sampled
    # remain (pool exhausts next round, then oldest-green-first).
    # Previously-green names stay locally harness-checked every round
    # via tools/check_correctness.py (full 564-entry drive).
    #
    # ADVICE-r13-fixed entries (driver confirms the fixes)
    "timeseries_sample_entropy", "stats_fisher_exact_2x2",
    "ir_query_clarity",
    # streaming: the entire remaining never-sampled streaming surface
    "stream_etl_clean", "stream_hll_maintenance", "stream_hopping_counts",
    "stream_sink_collection_roundtrip", "stream_stateful_user_totals",
    "stream_static_enrich", "stream_stream_interval_join",
    "stream_stream_left_outer_join",
    # multimodal decode legs never panel-sampled
    "multimodal_audio_features", "multimodal_frame_sample",
    "multimodal_video_decode",
    # time-series diagnostics (r13 waves + spectral family)
    "timeseries_crosscorr", "timeseries_dickey_fuller",
    "timeseries_hurst_rs", "timeseries_periodogram",
    "timeseries_spectral_entropy", "timeseries_turning_points",
    "changepoint_pettitt",
    # classical statistics (r13 waves)
    "stats_bartlett", "stats_breusch_pagan", "stats_cooks_distance",
    "stats_hill_tail_index", "stats_mood_median", "stats_welch_anova",
    "survival_weibull_medianrank",
    # evaluation harness: rank metrics + A/B + calibration
    "eval_average_precision_at_k", "eval_bland_altman",
    "eval_brown_forsythe", "eval_cochran_q", "eval_conformal_threshold",
    "eval_hosmer_lemeshow", "eval_rank_biased_precision",
    "eval_tost_equivalence",
    # graph centralities / structure
    "graph_harmonic_centrality", "graph_katz_centrality",
    "graph_powerlaw_alpha", "graph_two_hop_reach",
    # anomaly / forecast
    "anomaly_grubbs_daily", "anomaly_seasonal_baseline",
    "forecast_theta_method", "forecast_ewma_daily",
    # token / vocabulary statistics
    "token_adaptation_churchgale", "token_dispersion_dp",
    "source_vocab_jaccard",
    # similarity index maintenance
    "sim_index_incremental_append",
    # storage-layout / skew governance
    "zorder_cluster_key", "skew_key_report",
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
