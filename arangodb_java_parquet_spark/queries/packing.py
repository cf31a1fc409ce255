"""Best-fit-decreasing sequence packing (VERDICT r14 #7) — the
bin-packing leg of the training-sequence pipeline, beside the greedy
contiguous stream packer (`pack_token_sequences`, which splits
documents across sequence boundaries and therefore wastes nothing but
destroys document atomicity).

When documents must stay WHOLE inside a training sequence (the common
contract for instruction tuning and long-context curricula), packing
becomes classical bin packing: the padding waste IS the budget line a
100-TB pretraining run reports. Two deterministic packers per language
shard, same 512-token budget as the stream packer:

* NEXT-FIT in arrival (doc_id) order — the do-nothing baseline a naive
  loader implements: if the doc doesn't fit the open sequence, seal it
  and start a new one.
* BEST-FIT-DECREASING — sort docs by (n_tokens DESC, doc_id ASC), put
  each into the fullest bin that still fits (first such bin on load
  ties), else open a new bin. The textbook 11/9·OPT+6/9 guarantee
  (Dósa 2007); in practice within a percent of optimal.

Both folds run as ONE ordered-list aggregate per shard (the
forecast_holt_linear fold pattern): the accumulator is the multiset of
bin loads (array<bigint>), the per-item step is filter → max → splice —
exact integer arithmetic, so the only doubles in the output are the
fill-rate ratios of exact integers (plain division, IEEE-identical).
DuckDB's list_reduce has no init argument, so the seed rides as a
prepended sentinel element of matching LIST type (empty list for BFD,
[BUDGET, 0] for next-fit — the full seed forces the first item to open
bin 1, so an oversized first document cannot seal a phantom empty bin) — snapshot semantics are irrelevant here because
the accumulator is a plain list, not a struct (the in-place-mutation
trap is struct-specific).

Scale: per SHARD the fold is sequential (bin packing is inherently
order-dependent), but shards pack independently — the 100-TB spelling
keys shards finer (source × length-bucket) so each fold's item list is
bounded; the per-shard state (bin loads) is total_tokens/budget longs.
The fill-rate REPORT (this entry's output) is what the planner consumes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

_BUDGET = 512  # same budget as pack_token_sequences


_BFD_STEP = f"""(acc, x) -> CASE
  WHEN len(list_filter(acc, y -> y + x[1] <= {_BUDGET})) = 0
    THEN list_append(acc, x[1])
  ELSE list_concat(list_concat(
    acc[1:CAST(list_position(acc,
          list_max(list_filter(acc, y -> y + x[1] <= {_BUDGET})))
        AS INT) - 1],
    [list_max(list_filter(acc, y -> y + x[1] <= {_BUDGET})) + x[1]]),
    acc[CAST(list_position(acc,
          list_max(list_filter(acc, y -> y + x[1] <= {_BUDGET})))
        AS INT) + 1:len(acc)])
  END"""

_NF_STEP = f"""(acc, x) -> CASE
  WHEN acc[1] + x[1] <= {_BUDGET} THEN [acc[1] + x[1], acc[2]]
  ELSE [x[1], acc[2] + 1] END"""

_PACK_SQL = f"""
WITH sized AS (
  SELECT doc_id, lang, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
),
per AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nt) AS BIGINT) AS total_tokens,
         -- BFD: items sorted (nt DESC, doc_id ASC); seed = empty loads
         -- list prepended (list_reduce's first element IS the init)
         list_reduce(
           list_concat([CAST([] AS BIGINT[])],
                       list([CAST(nt AS BIGINT)]
                            ORDER BY nt DESC, doc_id ASC)),
           {_BFD_STEP}) AS bfd_loads,
         -- next-fit: arrival (doc_id) order; seed [BUDGET load,
         -- 0 bins] so the FIRST item always opens bin 1 — a [0,1] seed
         -- sealed a phantom empty bin when the first doc was oversized
         -- (review r15)
         list_reduce(
           list_concat([[CAST({_BUDGET} AS BIGINT), CAST(0 AS BIGINT)]],
                       list([nt, CAST(0 AS BIGINT)] ORDER BY doc_id)),
           {_NF_STEP}) AS nf_state
  FROM sized GROUP BY lang
)
SELECT lang AS shard, n_docs, total_tokens,
       CAST(nf_state[2] AS BIGINT) AS nextfit_bins,
       CAST(len(bfd_loads) AS BIGINT) AS bfd_bins,
       CAST(total_tokens AS DOUBLE)
         / (nf_state[2] * {_BUDGET}) AS nextfit_fill,
       CAST(total_tokens AS DOUBLE)
         / (len(bfd_loads) * {_BUDGET}) AS bfd_fill
FROM per
"""


@query("pack_bestfit_decreasing", _PACK_SQL)
def pack_bestfit_decreasing(spark, sf_dir):
    """Per-shard whole-document packing report: next-fit (arrival order)
    vs best-fit-decreasing bin counts and fill rates at the 512-token
    budget. See module docstring for the fold contract."""
    d = t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.col("lang").alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("nt"))
    per = sized.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        # (nt DESC, doc_id ASC) via sortable key (-nt, doc_id)
        F.expr("transform(array_sort(collect_list(struct(-nt AS s1,"
               " doc_id AS s2, nt AS v))), e -> e.v)").alias("desc_items"),
        F.expr("transform(array_sort(collect_list(struct(doc_id AS s1,"
               " nt AS v))), e -> e.v)").alias("arr_items"))
    bfd = F.expr(f"""
      aggregate(desc_items, CAST(array() AS ARRAY<BIGINT>),
        (acc, t) -> CASE
          WHEN size(filter(acc, y -> y + t <= {_BUDGET})) = 0
            THEN concat(acc, array(t))
          ELSE concat(
            slice(acc, 1,
                  CAST(array_position(acc,
                    array_max(filter(acc, y -> y + t <= {_BUDGET})))
                    AS INT) - 1),
            array(array_max(filter(acc, y -> y + t <= {_BUDGET})) + t),
            slice(acc,
                  CAST(array_position(acc,
                    array_max(filter(acc, y -> y + t <= {_BUDGET})))
                    AS INT) + 1,
                  size(acc)
                  - CAST(array_position(acc,
                      array_max(filter(acc, y -> y + t <= {_BUDGET})))
                      AS INT)))
          END)""")
    # seed [BUDGET, 0]: first item always opens bin 1 (review r15 —
    # mirrors the oracle's seed; a [0,1] seed miscounted an oversized
    # first doc as two bins)
    nf = F.expr(f"""
      aggregate(arr_items,
                array(CAST({_BUDGET} AS BIGINT), CAST(0 AS BIGINT)),
        (acc, t) -> CASE
          WHEN acc[0] + t <= {_BUDGET} THEN array(acc[0] + t, acc[1])
          ELSE array(t, acc[1] + 1) END)""")
    return (per.select("shard", "n_docs", "total_tokens",
                       bfd.alias("bfd_loads"), nf.alias("nf_state"))
            .select("shard", "n_docs", "total_tokens",
                    F.col("nf_state").getItem(1).cast("bigint")
                    .alias("nextfit_bins"),
                    F.size("bfd_loads").cast("bigint").alias("bfd_bins"),
                    (F.col("total_tokens").cast("double")
                     / (F.col("nf_state").getItem(1) * _BUDGET))
                    .alias("nextfit_fill"),
                    (F.col("total_tokens").cast("double")
                     / (F.size("bfd_loads").cast("bigint") * _BUDGET))
                    .alias("bfd_fill")))
