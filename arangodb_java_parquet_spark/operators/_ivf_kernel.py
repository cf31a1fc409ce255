"""Vectorized IVF fit kernel. NOTE: no ``from __future__ import
annotations`` here — pandas_udf infers its eval type from REAL pd.Series
type hints, and future-annotations stringifies them (same constraint as
functions/udafs.py)."""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_cell_udf(cent_lists):
    """Scalar pandas UDF mapping an array<float> vector column to the
    0-based index of its nearest centroid (squared-L2, numpy argmin —
    first occurrence, i.e. smallest index on ties)."""
    C = np.asarray(cent_lists, dtype="float64")

    @pandas_udf("int")
    def cell_of(v: pd.Series) -> pd.Series:
        X = np.array([np.asarray(x, dtype="float64") for x in v])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1))
    return cell_of
