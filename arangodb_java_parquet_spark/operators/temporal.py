"""Temporal operators Spark lacks natively: as-of join, sessionization.

Implemented as compositions of built-in DataFrame ops (SURVEY.md custom-
operator preference (a)), not UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str, left_time: str, right_time: str,
              value_cols: list[str],
              right_on: str | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_time <= left_time`` (direction="backward"), matched on ``on``.

    Strategy — union + sorted window, the shuffle-minimal formulation:
    tag both sides, union them, and within each ``on`` partition ordered by
    time take ``last(right value, ignorenulls=True)`` over the preceding
    frame. ONE shuffle total (the window partition), versus the naive
    inequality-join + groupBy which is O(matches) intermediate rows and two
    shuffles. At equal timestamps right rows sort before left rows so the
    match is inclusive.

    Scale: this is the standard large-scale formulation (also how
    pd.merge_asof would be driven per group); it never materializes the
    cross-match, so a user with 10^9 events × 10^7 quotes per key range
    stays linear.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    right_on = right_on or on

    l_tag = left.select(
        F.col(on).alias("__k"), F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.struct(*left.columns).alias("__row"))
    r_tag = right.select(
        F.col(right_on).alias("__k"), F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"))

    unioned = l_tag.unionByName(r_tag)
    w = (W.partitionBy("__k").orderBy("__t", "__is_left")
         .rowsBetween(W.unboundedPreceding, 0))
    filled = unioned.select(
        "__is_left", "__row",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in value_cols])
    return (filled.filter(F.col("__is_left") == 1)
            .select("__row.*", *[f"asof_{c}" for c in value_cols]))


def sessionize(df: DataFrame, *, key: str, time: str,
               gap: Column, tiebreak: list[str] | None = None) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same key exceeds ``gap`` (seconds).

    lag + cumulative sum of boundary flags — one shuffle on ``key``.
    ``tiebreak`` columns make ordering total when timestamps can collide.
    """
    w = W.partitionBy(key).orderBy(time, *(tiebreak or []))

    def epoch_s(c: Column) -> Column:
        # TIMESTAMP_NTZ can't cast straight to double; go through micros
        # (t() pins the session to UTC so NTZ->LTZ is identity).
        return F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000.0)

    prev = F.lag(time).over(w)
    new_session = (prev.isNull()
                   | (epoch_s(F.col(time)) - epoch_s(prev) > gap)).cast("long")
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn("session_seq", F.sum(new_session).over(wcum))
