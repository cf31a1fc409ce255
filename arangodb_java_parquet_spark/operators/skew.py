"""Skew-handling operators: salted two-stage aggregation.

Hot grouping keys (a handful of event types over billions of rows, the
power-law reality of every event/log table) make one reducer the straggler.
The classic fix: append a random-ish salt to the key, pre-aggregate
(key, salt) — spreading each hot key over N reducers — then merge the
partials in a second, tiny aggregation.

Results are EXACTLY equal to the unsalted aggregation for decomposable
aggregates (sum/count/min/max); the oracle checks that. The salt here is
deterministic (hash of a row-unique column mod N) so runs are reproducible.

Note Spark's AQE skew handling covers JOIN skew, not aggregation skew —
partial aggregation usually hides agg skew, but high-cardinality-payload
aggs (collect_list, exact distinct counting per hot key) still need the
salt pattern; this operator is the template.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, salt_src: str, aggs: dict,
               n_salts: int = 16) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column name -> (stage1_agg_fn, stage2_merge_fn),
    each a ``Column -> Column`` (e.g. count then sum of partial counts).
    ``salt_src`` is any row-level column whose hash spreads rows uniformly.
    """
    salt = (F.abs(F.hash(F.col(salt_src))) % n_salts).alias("__salt")
    stage1 = (df.withColumn("__salt", salt)
              .groupBy(key, "__salt")
              .agg(*[fn1(F.col(c_in)).alias(f"__p_{out}")
                     for out, (c_in, fn1, _fn2) in aggs.items()]))
    stage2 = (stage1.groupBy(key)
              .agg(*[fn2(F.col(f"__p_{out}")).alias(out)
                     for out, (_c, _f1, fn2) in aggs.items()]))
    return stage2
