"""Grouped-aggregate pandas UDFs (the UDAF member of the UDF/UDAF/UDTF
surface). NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the UDF kind (grouped-agg: Series -> scalar) from the evaluated type
hints.
"""

import math

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Exact-summation geometric mean: math.fsum over per-element logs is
    error-free, so the only cross-engine noise is the per-element ln ulp —
    callers round the result (see the query entry's determinism note)."""
    logs = [math.log(x) for x in v]
    return math.exp(math.fsum(logs) / len(logs))
