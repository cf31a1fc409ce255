"""Round-6 breadth: streaming MERGE/upsert with redelivery idempotence,
privacy risk reporting (k-anonymity / l-diversity), and in-engine PCA by
unrolled power iteration — each value-checked against a DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import (
    materialize, materialize_iter)
from arangodb_java_parquet_spark.queries.common import query, scratch_dir, t

# ---------------------------------------------------------------------------
# streaming MERGE upsert (last-write-wins keyed table)
# ---------------------------------------------------------------------------


@query("stream_upsert_merge", """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id AS last_event_id,
       event_type AS last_type, value AS last_value
FROM ranked WHERE rn = 1
""")
def stream_upsert_merge(spark, sf_dir):
    """Streaming MERGE/upsert drive
    (streaming/ingest.py:stream_upsert_keyed): the event stream feeds a
    keyed state table where each micro-batch UPDATEs existing keys to
    their newest row and INSERTs new keys — Delta-style MERGE from
    primitives, with an atomic directory swap per batch.

    The drive deliberately delivers the SAME file TWICE (two symlinks,
    maxFilesPerTrigger=1 → two micro-batches): last-write-wins makes
    redelivery a no-op, so the result still hash-matches the ONE-copy
    oracle — the at-least-once idempotence property checked end to end,
    not asserted."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from arangodb_java_parquet_spark.streaming.ingest import (
        stream_upsert_keyed)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    root = scratch_dir("ajps_upsert_")
    stream_dir = os.path.join(root, "in")
    os.makedirs(stream_dir)
    for name in ("ev_copy1.parquet", "ev_copy2.parquet"):
        os.symlink(os.path.realpath(f"{sf_dir}/events.parquet"),
                   os.path.join(stream_dir, name))
    state_dir = os.path.join(root, "state")
    q = stream_upsert_keyed(spark, stream_dir, schema=raw.schema,
                            state_dir=state_dir,
                            checkpoint_dir=os.path.join(root, "ckpt"))
    q.awaitTermination()
    return (spark.read.parquet(state_dir)
            .select("user_id",
                    F.col("event_id").alias("last_event_id"),
                    F.col("event_type").alias("last_type"),
                    F.col("value").alias("last_value")))


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy report
# ---------------------------------------------------------------------------

_KANON_K = 5


@query("privacy_k_anonymity", f"""
SELECT c_mktsegment, c_nationkey,
       COUNT(*) AS k_size,
       COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS INT))
         AS l_diversity,
       COUNT(*) < {_KANON_K} AS below_k
FROM customer
GROUP BY c_mktsegment, c_nationkey
""")
def privacy_k_anonymity(spark, sf_dir):
    """PRIVACY RISK report (Sweeney k-anonymity / Machanavajjhala
    l-diversity): group the table by its quasi-identifier combination
    (market segment × nation — the attributes an attacker could link
    externally) and report each equivalence class's size k and the
    diversity l of the sensitive attribute (the $1000 account-balance
    band) within it. Classes with k < {_KANON_K} are re-identification
    risks; k ok but l = 1 means the sensitive value leaks even without
    re-identification (homogeneity attack). One combinable aggregation,
    distinct-count shuffles the bounded (QI, sensitive) key space —
    the pre-release audit a training-data pipeline runs beside PII
    redaction (see pii_redaction / pii_pseudonymize)."""
    c = t(spark, sf_dir, "customer")
    return (c.groupBy("c_mktsegment", "c_nationkey")
            .agg(F.count(F.lit(1)).alias("k_size"),
                 F.countDistinct(
                     F.floor(F.col("c_acctbal") / 1000.0).cast("int"))
                 .alias("l_diversity"))
            .withColumn("below_k", F.col("k_size") < _KANON_K))


# ---------------------------------------------------------------------------
# PCA top component via unrolled power iteration on the Gram matrix
# ---------------------------------------------------------------------------

def _pca_sql() -> str:
    tri = """
SELECT a.i, b.j,
       CAST(SUM(CAST(embedding[a.i]::DOUBLE * embedding[b.j]::DOUBLE
                     AS DECIMAL(30,8))) AS DOUBLE) AS g
FROM embeddings,
     (SELECT UNNEST(range(1, 65)) AS i) a,
     (SELECT UNNEST(range(1, 65)) AS j) b
WHERE b.j >= a.i
GROUP BY 1, 2
"""
    iters = []
    prev = "v0"
    for k in (1, 2, 3):
        iters.append(f"""
w{k} AS (
  SELECT g.i,
         CAST(SUM(CAST(ROUND(g.g * {prev}.v, 9) AS DECIMAL(30,9)))
              AS DOUBLE) AS w
  FROM g JOIN {prev} ON {prev}.j = g.j GROUP BY 1
),
n{k} AS (SELECT MAX(ABS(w)) AS nrm FROM w{k}),
v{k} AS (SELECT w{k}.i AS j, ROUND(w{k}.w / n{k}.nrm, 9) AS v
         FROM w{k} CROSS JOIN n{k})""")
        prev = f"v{k}"
    return (f"WITH tri AS ({tri}),\n"
            "g AS (SELECT i, j, g FROM tri\n"
            "      UNION ALL SELECT j, i, g FROM tri WHERE i < j),\n"
            "v0 AS (SELECT UNNEST(range(1, 65)) AS j, 1.0::DOUBLE AS v),"
            + ",".join(iters), prev)


_PCA_CTE, _PCA_LAST = _pca_sql()


@query("emb_pca_power_iteration",
       _PCA_CTE + f"\nSELECT j AS dim, v AS pc1 FROM {_PCA_LAST}")
def emb_pca_power_iteration(spark, sf_dir):
    """PCA TOP COMPONENT entirely in-engine: 3 unrolled power iterations
    v ← G·v / max|G·v| over the 64×64 Gram matrix (the distributed d×d
    reduction emb_gram_matrix also computes; eigenvector up to the
    max-abs scaling, which is EXACT — no large-magnitude rounding — so
    the whole iteration is bit-reproducible cross-engine: matvec terms
    round-9 then decimal-summed, normalizer is a plain MAX of exact
    values, division IEEE-identical, round-9 re-fence per iteration).

    Scale: the corpus-sized work is ONE combinable pass building G;
    every iteration after that is a 64²-row broadcast join — at
    production dims (768-4096) G still fits in a broadcast and the same
    plan holds. The Arrow gram twin (gram_matrix_arrow) supplies G at
    dims where the explode formulation is impractical."""
    _g, v = _pca_gram_and_v(spark, sf_dir)
    return v.select(F.col("j").cast("bigint").alias("dim"),
                    F.col("v").alias("pc1"))


def _pca_gram_and_v(spark, sf_dir):
    """Shared PCA chain (mirrors _PCA_CTE): the materialized mirrored
    64x64 Gram matrix g(i, j) and the power-iteration eigenvector
    estimate v(j) after 3 round-9-fenced iterations — consumed by the
    component entry and the explained-variance entry.

    The Gram comes from the ARROW production path
    (operators/similarity.gram_matrix_arrow: one numpy d×d partial per
    partition, exact scaled-int64 accumulation — the per-partition
    analog of SUM(CAST(prod AS DECIMAL(30,8)))), which is bit-identical
    to the JVM decimal explode formulation the oracle CTE mirrors:
    tests/test_similarity.py::test_gram_matrix_arrow_matches_jvm pins
    full-matrix equality and test_pca_gram_input_matches_jvm pins the
    exact DataFrame this chain consumes. The swap (VERDICT r10 #3) cuts
    the entries' dominant cost ~10× — the explode path pushed d²/2 rows
    per vector through the aggregator; the Arrow path ships d²/2 rows
    per PARTITION — while the eigensolve inputs, and therefore the
    value oracles, are unchanged by the pin. The python stage is
    exact-integer arithmetic (hash-safe), disclosed in
    tests/test_plans.py alongside the UDTF exception."""
    from arangodb_java_parquet_spark.operators.similarity import (
        gram_matrix_arrow)
    e = t(spark, sf_dir, "embeddings")
    tri = gram_matrix_arrow(e, vec_col="embedding", dim=64, scale=8)
    # the full (mirrored) Gram feeds all three matvec iterations —
    # materialize once (non-canonicalizing mapInPandas lineage)
    g = (tri.unionByName(
            tri.filter(F.col("i") < F.col("j"))
            .select(F.col("j").alias("i"), F.col("i").alias("j"), "g"))
         .transform(materialize))
    v = spark.range(1, 65).select(F.col("id").cast("int").alias("j"),
                                  F.lit(1.0).alias("v"))
    for _ in range(3):
        # each matvec result feeds TWO consumers (its own normalizer and
        # the normalized vector) and the next iteration chains on both —
        # without materializing, the lineage doubles per iteration
        # (2^3 re-derivations, 42 exchanges measured). 64 rows.
        w = (g.join(F.broadcast(v), "j")
             .groupBy("i")
             .agg(F.sum(F.round(F.col("g") * F.col("v"), 9)
                        .cast("decimal(30,9)")).cast("double").alias("w"))
             .transform(materialize_iter))
        nrm = w.agg(F.max(F.abs(F.col("w"))).alias("nrm"))
        v = (w.crossJoin(F.broadcast(nrm))
             .select(F.col("i").alias("j"),
                     F.round(F.col("w") / F.col("nrm"), 9).alias("v")))
    return g, v.transform(materialize)


# ---------------------------------------------------------------------------
# left-outer stream-stream join, driven to batch equivalence
# ---------------------------------------------------------------------------


@query("stream_stream_left_outer_join", """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts
FROM events c
LEFT JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click'
""")
def stream_stream_left_outer_join(spark, sf_dir):
    """LEFT-OUTER stream-stream interval join driven to FULL batch
    equivalence — the shape inner joins can't prove: unmatched left rows
    are held in state and only released (with NULL right columns) when
    the GLOBAL watermark passes their join window. The drive streams the
    real events first (all inner matches emit; unmatched clicks stay in
    state), then far-future SENTINEL rows per side (user_id -1, +10/+20
    days) advance the min-across-sides watermark, evicting and emitting
    every held row. Sentinels are filtered AFTER the join, so the sink
    equals the batch LEFT JOIN row-for-row — watermark semantics
    value-checked, not asserted. (Same mechanics as
    tests/test_streaming.py's left-outer drive, here against the real
    events table with a DuckDB oracle.)

    r16 (VERDICT r15 #8, the one streaming floor experiment): the r15
    drive ran THREE separate availableNow query starts over a shared
    checkpoint (real events, sentinel round 1, sentinel round 2), paying
    stream-query init + state-store reload twice more than needed. All
    three files are now staged UP FRONT and ONE availableNow start with
    maxFilesPerTrigger=1 processes them as the SAME ordered micro-batch
    sequence (file order pinned by explicit ascending mtimes; the
    watermark advances between batches exactly as it did between
    restarts, since a restart resumes from the checkpointed watermark
    the previous batch committed). Same batch sequence -> same eviction
    -> same sink rows; the oracle re-gates it."""
    import glob as _glob
    import shutil as _shutil

    from arangodb_java_parquet_spark.streaming.ingest import (
        event_time_ltz, stream_interval_join)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    root = scratch_dir("ajps_sslo_")
    src = os.path.join(root, "in")
    os.makedirs(src)
    os.symlink(os.path.realpath(f"{sf_dir}/events.parquet"),
               os.path.join(src, "aa_events.parquet"))
    out = os.path.join(root, "out")
    ck = os.path.join(root, "ckpt")

    def drive():
        stream = (spark.readStream.schema(raw.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        sides = []
        for etype, pref in (("click", "c"), ("purchase", "p")):
            s = (event_time_ltz(stream)
                 .filter(F.col("event_type") == etype)
                 .withWatermark("ts", "1 hour")
                 .select(F.col("user_id").alias(f"{pref}_user"),
                         F.col("ts").alias(f"{pref}_ts"),
                         F.col("event_id").alias(f"{pref}_id")))
            sides.append(s)
        # NB: do NOT filter the sentinels here — a c_user >= 0 predicate
        # gets pushed through the join into the parquet scan, whose
        # row-group stats then prune the whole sentinel file BEFORE it
        # can advance the watermark (cost a debugging cycle; the filter
        # happens on the sink read-back below instead)
        joined = (stream_interval_join(
            sides[0], sides[1], left_key="c_user", right_key="p_user",
            left_time="c_ts", right_time="p_ts",
            within="30 minutes", how="left_outer")
            .select(F.col("c_user").alias("user_id"),
                    F.col("c_id").alias("click_id"),
                    F.col("p_id").alias("purchase_id"),
                    F.col("c_ts").cast("timestamp_ntz").alias("click_ts"),
                    F.col("p_ts").cast("timestamp_ntz")
                    .alias("purchase_ts")))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (joined.writeStream.outputMode("append").format("parquet")
                 .option("path", out).option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    # sentinels: one click + one purchase per round, 10/20 days past the
    # max event time on user -1. TWO sentinel rounds because eviction in
    # batch N uses the watermark computed through batch N-1: the
    # sentinel-1 batch evicts everything older than max_real - 1h, the
    # sentinel-2 batch executes with the sentinel-1 watermark and evicts
    # the last-90-minutes stragglers. Staged BEFORE the single drive;
    # maxFilesPerTrigger=1 turns them into the same ordered batch
    # sequence the r15 three-start protocol produced (explicit ascending
    # mtimes pin the file-source discovery order).
    top = raw.orderBy(F.desc("ts")).limit(1)
    ts_t = dict(raw.dtypes)["ts"]
    base_mtime = os.stat(os.path.join(src, "aa_events.parquet")).st_mtime
    for rnd, days in ((1, 10), (2, 20)):
        bump = (F.col("ts") + days * 86400 * 10**9 if ts_t == "bigint"
                else F.expr(f"ts + INTERVAL {days} DAYS"))
        sent = None
        for i, etype in enumerate(("click", "purchase")):
            one = top.select(
                F.lit(-(2 * rnd) - i + 1).alias("event_id"),
                bump.alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit(etype).alias("event_type"),
                F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
            sent = one if sent is None else sent.unionByName(one)
        tmp = os.path.join(root, f"sentinel{rnd}")
        sent.coalesce(1).write.parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"zz_sentinel{rnd}.parquet")
        _shutil.copy(part, dst)
        os.utime(dst, (base_mtime + 3600 * rnd, base_mtime + 3600 * rnd))
    drive()
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)


# ---------------------------------------------------------------------------
# streaming incremental rollup maintenance (round 7)
# ---------------------------------------------------------------------------

@query("stream_incremental_daily_rollup", """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""")
def stream_incremental_daily_rollup(spark, sf_dir):
    """INCREMENTAL VIEW MAINTENANCE as a streaming drive
    (streaming/ingest.py:stream_incremental_rollup): the event stream is
    delivered as two DISJOINT halves (event_id parity, one file per
    micro-batch via maxFilesPerTrigger=1); each batch merges its (day,
    event_type) partials — count + exact DECIMAL sum — into the
    persistent rollup by ADDING partials. The oracle recomputes the
    rollup from the full table, so the hash match proves algebraic merge
    == full recompute, the property that lets a 100 TB lake maintain its
    aggregates by reading only new files."""
    import os
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from arangodb_java_parquet_spark.streaming.ingest import (
        event_time_ltz, stream_incremental_rollup)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    root = scratch_dir("ajps_incroll_")
    stream_dir = os.path.join(root, "in")
    os.makedirs(stream_dir)
    # the file stream source lists plain files — write each half as a
    # single part and move it up as <stream_dir>/halfN.parquet
    import glob
    import shutil
    for i in range(2):
        tmp_dir = os.path.join(root, f"tmp_half{i}")
        (raw.filter(F.col("event_id") % 2 == i).coalesce(1)
         .write.mode("overwrite").parquet(tmp_dir))
        part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(stream_dir, f"half{i}.parquet"))
        shutil.rmtree(tmp_dir, ignore_errors=True)
    state_dir = os.path.join(root, "state")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = stream_incremental_rollup(
            spark, stream_dir, schema=raw.schema, state_dir=state_dir,
            checkpoint_dir=os.path.join(root, "ckpt"))
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (spark.read.parquet(state_dir)
            .select("day", "event_type", "n_events",
                    F.col("sum_value").cast("double").alias("sum_value")))


# ---------------------------------------------------------------------------
# t-closeness (round 9d): distributional privacy beyond l-diversity
# ---------------------------------------------------------------------------

@query("privacy_t_closeness", """
WITH base AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat,
         CAST(FLOOR(c_acctbal / 1000.0) AS INT) AS sens
  FROM customer
),
gdist AS (SELECT sens, CAST(COUNT(*) AS BIGINT) AS n_s FROM base
         GROUP BY sens),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
cls AS (SELECT seg, nat, CAST(COUNT(*) AS BIGINT) AS n_c FROM base
        GROUP BY seg, nat),
cs AS (SELECT seg, nat, sens, CAST(COUNT(*) AS BIGINT) AS n_cs FROM base
       GROUP BY seg, nat, sens),
expanded AS (
  SELECT c.seg, c.nat, c.n_c, g.sens, g.n_s, COALESCE(x.n_cs, 0) AS n_cs
  FROM cls c CROSS JOIN gdist g
  LEFT JOIN cs x ON x.seg = c.seg AND x.nat = c.nat AND x.sens = g.sens
)
SELECT seg AS c_mktsegment, nat AS c_nationkey,
       CAST(MAX(n_c) AS BIGINT) AS k_size,
       CAST(SUM(CAST(ROUND(abs(n_cs / CAST(n_c AS DOUBLE)
                               - n_s / CAST(n AS DOUBLE)), 9)
                     AS DECIMAL(20,9))) AS DOUBLE) / 2 AS t_closeness_tvd
FROM expanded CROSS JOIN tot
GROUP BY seg, nat
""")
def privacy_t_closeness(spark, sf_dir):
    """t-CLOSENESS report (Li, Li & Venkatasubramanian 2007) — the
    distributional tier above privacy_k_anonymity's k/l columns: for
    each quasi-identifier equivalence class, the total-variation
    distance between the class's sensitive-value distribution (the
    $1000 account-balance band) and the GLOBAL distribution. l-diversity
    misses skewness attacks (a class can have l distinct values but
    99% mass on one); a class with large TVD leaks information even
    when k and l pass. Release gate: max(t_closeness_tvd) <= t.

    The class x sensitive-domain expansion is a cross join of two
    BOUNDED aggregates (classes x bands — never rows); absent
    combinations are pinned at 0 by the left join so the TVD sums over
    the full domain. All counts integer; the per-term |p_c - p_g| is a
    difference of single IEEE divisions, round-9 fenced into an exact
    decimal sum, halved once at the end."""
    c = t(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("sens"))
    glob = base.groupBy("sens").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s"))
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cls = base.groupBy("seg", "nat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c"))
    cs = (base.groupBy("seg", "nat", "sens")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_cs"))
          .withColumnRenamed("seg", "xseg")
          .withColumnRenamed("nat", "xnat")
          .withColumnRenamed("sens", "xsens"))
    expanded = (cls.crossJoin(F.broadcast(glob))
                .join(cs, (F.col("seg") == F.col("xseg"))
                      & (F.col("nat") == F.col("xnat"))
                      & (F.col("sens") == F.col("xsens")), "left")
                .select("seg", "nat", "n_c", "sens", "n_s",
                        F.coalesce("n_cs", F.lit(0)).alias("n_cs")))
    term = F.abs(F.col("n_cs") / F.col("n_c").cast("double")
                 - F.col("n_s") / F.col("n").cast("double"))
    return (expanded.crossJoin(F.broadcast(tot))
            .groupBy("seg", "nat")
            .agg(F.max("n_c").cast("bigint").alias("k_size"),
                 (F.sum(F.round(term, 9).cast("decimal(20,9)"))
                  .cast("double") / 2).alias("t_closeness_tvd"))
            .select(F.col("seg").alias("c_mktsegment"),
                    F.col("nat").alias("c_nationkey"),
                    "k_size", "t_closeness_tvd"))


@query("emb_pca_explained_variance", _PCA_CTE + f"""
, gv AS (
  SELECT g.i,
         CAST(SUM(CAST(ROUND(g.g * {_PCA_LAST}.v, 9) AS DECIMAL(30,9)))
              AS DOUBLE) AS w
  FROM g JOIN {_PCA_LAST} ON {_PCA_LAST}.j = g.j GROUP BY 1
),
lam AS (
  SELECT CAST(SUM(CAST(ROUND(gv.w * {_PCA_LAST}.v, 9) AS DECIMAL(30,9)))
              AS DOUBLE)
           / CAST(SUM(CAST(ROUND({_PCA_LAST}.v * {_PCA_LAST}.v, 9)
                           AS DECIMAL(30,9))) AS DOUBLE) AS lambda1
  FROM gv JOIN {_PCA_LAST} ON {_PCA_LAST}.j = gv.i
),
tr AS (
  SELECT CAST(SUM(CAST(g AS DECIMAL(30,8))) AS DOUBLE) AS trace_g
  FROM g WHERE i = j
)
SELECT lam.lambda1, tr.trace_g,
       lam.lambda1 / tr.trace_g AS explained_variance_ratio
FROM lam CROSS JOIN tr
""")
def emb_pca_explained_variance(spark, sf_dir):
    """TOP-COMPONENT EXPLAINED VARIANCE — the number the PCA entry's
    eigenvector lacks: the Rayleigh quotient lambda_1 = v'Gv / v'v of
    the power-iteration estimate against trace(G) = sum of eigenvalues,
    i.e. what fraction of total (uncentered) embedding energy the top
    direction carries — the collapse-vs-spread scalar read next to
    anisotropy and effective rank. Shares the exact Gram + iteration
    chain with emb_pca_power_iteration (_pca_gram_and_v /_PCA_CTE — one
    source of truth); adds one 64-row matvec, two round-9 decimal dot
    products, and the exact-decimal trace. The final ratio is a plain
    division of identical doubles."""
    g, v = _pca_gram_and_v(spark, sf_dir)
    gv = (g.join(F.broadcast(v), "j")
          .groupBy("i")
          .agg(F.sum(F.round(F.col("g") * F.col("v"), 9)
                     .cast("decimal(30,9)")).cast("double").alias("w")))
    v2 = v.select(F.col("j").alias("i"), F.col("v").alias("vi"))
    lam = (gv.join(F.broadcast(v2), "i")
           .agg((F.sum(F.round(F.col("w") * F.col("vi"), 9)
                       .cast("decimal(30,9)")).cast("double")
                 / F.sum(F.round(F.col("vi") * F.col("vi"), 9)
                         .cast("decimal(30,9)")).cast("double"))
                .alias("lambda1")))
    tr = (g.filter(F.col("i") == F.col("j"))
          .agg(F.sum(F.col("g").cast("decimal(30,8)")).cast("double")
               .alias("trace_g")))
    return (lam.crossJoin(F.broadcast(tr))
            .select("lambda1", "trace_g",
                    (F.col("lambda1") / F.col("trace_g"))
                    .alias("explained_variance_ratio")))


@query("privacy_delta_presence", """
WITH sample AS (SELECT DISTINCT o_custkey FROM orders),
cls AS (
  SELECT c.c_mktsegment, c.c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_class,
         CAST(SUM(CASE WHEN s.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_in_sample
  FROM customer c LEFT JOIN sample s ON s.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, c_nationkey, n_class, n_in_sample,
       n_in_sample / CAST(n_class AS DOUBLE) AS presence_rate,
       n_in_sample = n_class AS certain_presence,
       n_in_sample = 0 AS certain_absence
FROM cls
""")
def privacy_delta_presence(spark, sf_dir):
    """DELTA-PRESENCE disclosure audit (Nergiz, Atzori & Clifton 2007)
    — the privacy tier the k-anonymity/l-diversity/t-closeness reports
    don't cover: when a DERIVED dataset is published (here: the set of
    customers who placed orders), an attacker who knows an individual's
    quasi-identifiers learns they are in the dataset with probability
    equal to their QI class's presence rate. presence_rate = 1 reveals
    membership with certainty (every customer in that segment x nation
    placed an order); rate = 0 reveals certain absence — both are
    disclosures even though the published data is 'anonymous'. One
    distinct-projection of the published set + one combinable per-class
    aggregation; the report is QI-grid-sized. Pure integer counting to
    one division."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    sample = o.select("o_custkey").distinct()
    cls = (c.join(sample, c.c_custkey == sample.o_custkey, "left")
           .groupBy("c_mktsegment", "c_nationkey")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_class"),
                F.sum(F.when(F.col("o_custkey").isNotNull(), 1)
                      .otherwise(0)).cast("bigint").alias("n_in_sample")))
    return cls.select(
        "c_mktsegment", "c_nationkey", "n_class", "n_in_sample",
        (F.col("n_in_sample") / F.col("n_class").cast("double"))
        .alias("presence_rate"),
        (F.col("n_in_sample") == F.col("n_class"))
        .alias("certain_presence"),
        (F.col("n_in_sample") == 0).alias("certain_absence"))
