"""Empirical scaling probe: run flagship operators at 1x / 4x / 10x the
sf0.1 data volume and measure how wall time actually grows, writing
SCALE_PROBE.md.

"Designed for 100 TB" claims in docstrings are plan-shape arguments; this
tool adds MEASURED evidence on this box: a replica-expanded copy of each
input table (ids offset per replica so keys stay unique and dedup/join
semantics stay honest) is written once per factor under /tmp, and each
probed query runs best-of-2 with the noop sink at every factor. The
report records the per-query scaling exponent
log(t_10x / t_1x) / log(10) — ~1.0 = linear, <1 = fixed costs still
dominate at this size, >>1 = superlinear (a scale problem).

Usage: python tools/scale_probe.py [--factors 1,4,10] [--base SF_DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries import QUERIES
from arangodb_java_parquet_spark.session import get_spark

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# per-table (id columns to offset per replica) — keeps keys globally
# unique so groupBy/dedup/join cardinalities scale honestly. Dimension
# tables (region/nation) are NOT replicated: scaling data volume does not
# multiply the world's regions.
ID_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
NO_REPLICATE = {"region", "nation"}

PROBES = [
    # the headline relational + LLM-pipeline operators whose 100 TB
    # stories the docstrings argue; each is oracle-checked at base sf
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_signatures",
    "sim_topk_lsh_bucketed",
    "sessionize_events",
    "pack_token_sequences",
    "text_quality_stats",
    "quality_filter_rules",
    "data_shuffle_shards",
    "train_test_split_hash",
    # iterative / graph / explode-heavy shapes — where superlinear risk
    # actually lives (plan-depth growth, candidate-pair blowup, token
    # explodes); all bounded designs whose exponents should stay ~linear
    "graph_pagerank_simdocs",
    "graph_label_propagation",
    "graph_triangle_count",
    "dedup_cluster_components",
    "emb_gram_matrix_arrow",
    "ir_bm25_score",
    "tfidf_top_terms",
    "quality_bigram_logprob",
    # round-6 flagships: stored-index probe (the fit runs once per
    # replica store, so the probed measurement is the serving cost),
    # skew-capped banding, unrolled power iteration, CDC apply
    "sim_topk_ivfpq_stored",
    "dedup_lsh_capped_pairs",
    "emb_pca_power_iteration",
    "cdc_apply_changes",
    # round-7 flagships: capped PPJoin, sparse TF-IDF retrieval, blocked
    # SNM, DSIR weights (bounded hashed-vocab broadcast)
    "dedup_ppjoin_prefix",
    "sim_tfidf_cosine_topk",
    "dedup_sorted_neighborhood",
    "quality_dsir_weights",
    # round-9 additions (VERDICT r8 item 6): wave-5-7 flagships without
    # measured exponents, the incremental-rollup BATCH twin
    # (rollup_cascade_daily — the streaming maintainer merges the same
    # combinable partials), and the new global ExactSubstr pass
    "emb_knn_outlier_score",
    "dq_header_detail_reconcile",
    "corpus_diversity_minhash",
    "rollup_cascade_daily",
    "dedup_exactsubstr_spans",
    # round-9b flagships: fixed-panel retrieval eval (capped |Q|), RAKE
    # (token explode + vocab-bounded joins), greedy k-center (K corpus
    # scans), cluster-safe split (materialized-component consumer)
    "eval_rank_metrics",
    "keywords_rake",
    "coreset_kcenter_greedy",
    "split_leakage_safe_report",
    # round-9c flagships: token-keyed BLEU/ROUGE clipping, KN model fit
    # + score (two corpus passes), LPA-derived modularity, triangle/wedge
    # transitivity, conformal order statistic, panel-capped Matryoshka
    "eval_bleu_rouge_pairs",
    "quality_kneser_ney_logprob",
    "graph_modularity_lpa",
    "graph_clustering_coefficient",
    "eval_conformal_coverage",
    "emb_matryoshka_recall",
    # round-9d flagships: bounded-domain TVD expansion, O(n) anisotropy
    # via the mean-vector identity, IRLS-scored TakeOrdered acquisition
    "privacy_t_closeness",
    "emb_anisotropy_score",
    "active_margin_sampling",
    # round-9e flagships: sparse-offset QL scoring, fixed-round TextRank
    # over the token co-occurrence graph, bit-collapsed minhash pairs
    "ir_dirichlet_lm_score",
    "keywords_textrank",
    "dedup_minhash_bbit",
    "eval_krippendorff_alpha",
    # round-9f flagships
    "eval_auc_pr",
    "rfm_migration_matrix",
    "cohort_ltv_curve",
    "emb_effective_rank",
    # round-9g flagships
    "attribution_time_decay",
    "markov_next_event_accuracy",
    "dq_functional_dependencies",
    # round-10 flagships: the ExactSubstr APPLY step (islands join-back +
    # indexed array filter), winnowing selection (per-doc windows) and
    # its capped fingerprint match join, vocab-bounded JS divergence,
    # and the 2-hop harmonic centrality (edges self-join, Σ deg² bound)
    "dedup_exactsubstr_apply",
    "dedup_winnowing_density",
    "dedup_winnowing_matches",
    "mixture_js_divergence",
    "graph_harmonic_centrality",
    # round-10b flagships: source-bounded shingle join, O(T) MATTR
    "dedup_cross_source_containment",
    "quality_mattr",
    # round-10c flagships: softmax-thresholded confident joint (NB chain)
    "label_confident_joint",
    # round-10d/e flagships: conditional-entropy bigram pass, LLR
    # collocations (bigram marginal joins), threshold-swept rich club
    "text_bigram_entropy_rate",
    "token_collocations_llr",
    "graph_rich_club_coefficient",
    # round-11 flagships: KMV TakeOrdered k-min selection, the s-curve
    # planner over the LSH-bounded pair table, A-Res TakeOrdered
    # reservoirs, per-source dedup+grid projection, and the Arrow-Gram
    # PCA chain (the r11 cutover — exponent should now track the Arrow
    # twin's, not the explode path's)
    "sketch_kmv_distinct_ops",
    "dedup_lsh_param_planner",
    "sample_weighted_ares",
    "mixture_data_constrained_epochs",
    "emb_pca_explained_variance",
    "emb_alignment_uniformity",
    # round-11 wave 2-4 flagships: per-doc window chunking + hash-keyed
    # dedup accounting, stopword-anchored signature postings (DF-capped
    # pair join), degree-weighted two-hop scoring, the Arrow-Gram CKA,
    # block-size-only linkage accounting, and the per-type fold (the
    # corpus-sized stage is the daily aggregation)
    "dedup_cdc_chunking",
    "dedup_spotsigs",
    "graph_adamic_adar",
    "emb_linear_cka",
    "linkage_blocking_quality",
    "forecast_holt_linear",
    # round-12 flagships: broadcast-query brute-force ranking (the
    # retrieval-eval base table), support-bounded Wasserstein CDF pass,
    # basket-bounded brand pair join, power iteration on the capped
    # graph, per-doc integer tf moments, per-customer CUPED moments
    "eval_ndcg_at_k",
    "drift_wasserstein_1d",
    "market_basket_rules",
    "graph_eigenvector_centrality",
    "text_yules_k",
    "eval_cuped_adjustment",
    "survival_log_rank",
    # round-12 session-2 flagships: mutual-reinforcement iterations on the
    # transaction bipartite, per-node triangles on the capped graph,
    # density-ratio LOF on the SRP-capped candidate join, half-doc
    # presence-set joins, the B=200 md5 replicate fan-out, the degree-tail
    # MLE, Dirichlet log-odds keyness, and part-bounded DP dispersion
    "graph_hits_scores",
    "graph_local_clustering",
    "emb_lof_outliers",
    "token_adaptation_churchgale",
    "eval_permutation_signflip",
    "graph_powerlaw_alpha",
    "text_fightin_words",
    "token_dispersion_dp",
    # round-14 flagships: the tokenizer fits (vocabulary-scale lattice,
    # should be sublinear past the word-count rollup), grid DBSCAN
    # (density doubles with replicas in the fixed 2-D box — the probe
    # measures how the cell-join pair count actually grows), facility
    # location (candidate-bounded pair table), the bins^2 isotonic
    # lattice, and the CM sketch (combinable cells)
    "unigram_lm_fit",
    "wordpiece_greedy_fertility",
    "gmm_em_diag_2d",
    "cluster_dbscan_grid",
    "coreset_facility_location",
    "eval_isotonic_calibration",
    "agg_count_min_sketch",
    "regression_huber_irls",
    # round-15 continuation flagships: per-doc parse folds (LZ78),
    # blocked pair folds (Jaro-Winkler — pair count grows with block
    # density), the per-source MG stream fold (stream length grows
    # linearly), SQ8 ADC scan, the windowed KNN-Shapley suffix sum,
    # and the constant-size-after-rollup Sinkhorn/Shapley pair
    "quality_lz78_compression",
    "dedup_jaro_winkler",
    "sketch_misra_gries",
    "sim_topk_sq8",
    "knn_shapley_valuation",
    "ot_sinkhorn_distance",
    "attribution_shapley",
]


def build_scaled(spark, base: str, factor: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(f"{base}/{t}.parquet")
        if t in NO_REPLICATE or factor == 1:
            src.write.mode("overwrite").parquet(dst)
            continue
        offs = ID_OFFSETS[t]
        maxs = src.agg(*[F.max(c).alias(c) for c in offs]).collect()[0]
        reps = spark.range(factor).withColumnRenamed("id", "__rep")
        wide = src.crossJoin(F.broadcast(reps))
        for c in offs:
            wide = wide.withColumn(
                c, F.col(c) + F.col("__rep") * (int(maxs[c]) + 1))
        wide.drop("__rep").write.mode("overwrite").parquet(dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,10")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", action="store_true",
                    help="keep the scaled parquet dirs")
    ap.add_argument("--probes", default=None,
                    help="comma-separated subset of PROBES to run "
                         "(isolated re-measure; skips the report write)")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    probes = PROBES
    write_report = True
    if args.probes:
        probes = [p.strip() for p in args.probes.split(",")]
        unknown = [p for p in probes if p not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown probe names: {unknown}")
        write_report = False
    spark = get_spark(app_name="scale-probe")
    root = "/tmp/ajps_scale_probe"

    dirs = {}
    for f in factors:
        d = os.path.join(root, f"x{f}")
        print(f"building x{f} ...", flush=True)
        build_scaled(spark, args.base, f, d)
        dirs[f] = d

    # warm codegen/JIT on the smallest factor
    for name in probes:
        QUERIES[name](spark, dirs[factors[0]]).write.format("noop") \
            .mode("overwrite").save()

    results: dict[str, dict[int, float]] = {}
    for name in probes:
        results[name] = {}
        for f in factors:
            best = None
            for _ in range(2):
                t0 = time.time()
                QUERIES[name](spark, dirs[f]).write.format("noop") \
                    .mode("overwrite").save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            results[name][f] = best
            print(f"  {name} x{f}: {best:.2f}s", flush=True)

    f_lo, f_hi = factors[0], factors[-1]
    lines = [
        "# SCALE_PROBE — measured scaling of flagship operators",
        "",
        f"Base: `{args.base}` replicated with per-replica id offsets "
        f"(dims not replicated). Wall seconds, best-of-2, noop sink, "
        f"local[32]. Exponent = log(t_x{f_hi}/t_x{f_lo}) / "
        f"log({f_hi}/{f_lo}): ~1.0 linear; <1 fixed-cost-dominated at "
        "this size; >>1 would flag a scale problem.",
        "",
        "| query | " + " | ".join(f"x{f}" for f in factors)
        + " | exponent |",
        "|---|" + "---|" * (len(factors) + 1),
    ]
    for name in probes:
        r = results[name]
        expo = (math.log(r[f_hi] / r[f_lo]) / math.log(f_hi / f_lo)
                if r[f_lo] > 0 else float("nan"))
        lines.append(
            f"| {name} | "
            + " | ".join(f"{r[f]:.2f}" for f in factors)
            + f" | {expo:.2f} |")
    lines += [
        "",
        "Adjudicated exponents (data growth, not plan defects): on the",
        "replica corpus identical texts land in the same LSH buckets, so",
        "the similarity graph grows f-cliques — the hop-2 pair POPULATION",
        "(Σ deg², the quantity graph_harmonic_centrality and the triangle",
        "family enumerate) itself grows superlinearly with the factor.",
        "The serving-path mitigation is the capped candidate graph",
        "(lsh_candidate_pairs_capped, connectivity-preserving): on the",
        "duplicate-heavy SKEW_PROBE corpus the capped triangle enumeration",
        "— the same Σ deg² bound — measures exponent ~0.6 vs ~2.0",
        "uncapped. Diagnostics that must run BEFORE dedup go through the",
        "capped graph; after dedup the cliques are gone by construction.",
    ]
    out = "\n".join(lines) + "\n"
    if write_report:
        with open("SCALE_PROBE.md", "w") as fh:
            fh.write(out)
    print("\n" + out)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
