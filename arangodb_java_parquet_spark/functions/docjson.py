"""Row -> JSON document encoding, the Spark re-expression of the reference's
``GenericRecordJsonEncoder`` (GenericRecordJsonEncoder.java:42-216).

Two modes (SURVEY.md §1.3, §7 "hard parts"):

* ``mode="spark"`` (default, fast path): ``to_json(struct("*"))`` — a JVM-side
  whole-stage-codegen expression; field order follows the schema, nested
  struct/array/map supported natively. Documented divergences from the
  reference encoder: binary columns are base64 (not the ``{"bytes": ...}``
  ISO-8859-1 wrapper), NaN/Infinity doubles are emitted as to_json emits them
  (JSON has no NaN), timestamps/dates are ISO strings (the reference emits raw
  epoch numbers unless a converter is registered).

* ``mode="reference"`` (fidelity path): an Arrow-batched pandas UDF that
  reproduces the reference encoder's exact output byte-for-byte for flat
  schemas:
    - output field order = schema field order
      (GenericRecordJsonEncoder.java:150-152)
    - bytes -> ``{"bytes": "<ISO-8859-1-decoded, escaped>"}`` wrapper
      (GenericRecordJsonEncoder.java:113-117,174-176)
    - NaN / ±Infinity quoted as JSON strings ("NaN", "Infinity",
      "-Infinity") (GenericRecordJsonEncoder.java:118-124)
    - string escaping of ", \\, \\b \\f \\n \\r \\t plus \\uXXXX
      (uppercase hex) for U+0000–U+001F, U+007F–U+009F and U+2000–U+20FF
      (GenericRecordJsonEncoder.java:178-216)
    - unconverted timestamp/date columns emit raw epoch numbers, matching the
      reference's fall-through for unregistered logical types
      (GenericRecordJsonEncoder.java:133-137): timestamps as epoch
      microseconds, dates as days since epoch.

The fidelity path is Python (slow path by design, opt-in); the default path
stays entirely JVM-side.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_COL = "__doc__"

# ---------------------------------------------------------------------------
# fast path: to_json
# ---------------------------------------------------------------------------


def encode_documents(df: DataFrame, mode: str = "spark",
                     converters: dict | None = None) -> DataFrame:
    """Return a single-column (``__doc__`` string) DataFrame of JSON documents.

    ``converters`` maps a Spark DataType *simpleString* (e.g. ``"timestamp"``,
    ``"date"``, ``"binary"``, ``"decimal(18,2)"``) to a ``Column -> Column``
    function applied to every top-level field of that type before encoding —
    the Spark analog of the reference's per-LogicalType converter registry
    (ParquetArangoLoader.java:34,74-76; applied top-level-only, matching
    GenericRecordJsonEncoder.java:28-32).
    """
    if converters:
        df = apply_type_converters(df, converters)
    if mode == "spark":
        return df.select(F.to_json(F.struct(*df.columns)).alias(DOC_COL))
    if mode == "reference":
        return _encode_reference_fidelity(df)
    raise ValueError(f"unknown encode mode: {mode!r}")


def apply_type_converters(df: DataFrame, converters: dict) -> DataFrame:
    """Apply ``{type_simple_string: Column->Column}`` to matching top-level
    fields (top-level-only on purpose — reference parity, SURVEY.md §1.3)."""
    cols: list[Column] = []
    for field in df.schema.fields:
        fn = converters.get(field.dataType.simpleString())
        col = F.col(field.name)
        cols.append(fn(col).alias(field.name) if fn else col)
    return df.select(*cols)


# ---------------------------------------------------------------------------
# fidelity path: exact reference-encoder semantics (flat schemas)
# ---------------------------------------------------------------------------

_ESCAPES = {'"': '\\"', "\\": "\\\\", "\b": "\\b", "\f": "\\f",
            "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _escape_string(s: str) -> str:
    """Reference string escaping (GenericRecordJsonEncoder.java:178-216):
    named escapes plus uppercase \\uXXXX for the three control ranges."""
    out = []
    for ch in s:
        esc = _ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
            continue
        cp = ord(ch)
        if cp <= 0x1F or 0x7F <= cp <= 0x9F or 0x2000 <= cp <= 0x20FF:
            out.append("\\u%04X" % cp)
        else:
            out.append(ch)
    return "".join(out)


def _encode_scalar(v, kind: str) -> str:
    if v is None:
        return "null"
    if kind == "string":
        return '"%s"' % _escape_string(v)
    if kind == "bytes":
        # {"bytes": "<ISO-8859-1-decoded>"} wrapper
        # (GenericRecordJsonEncoder.java:113-117,174-176)
        return '{"bytes": "%s"}' % _escape_string(bytes(v).decode("ISO-8859-1"))
    if kind == "bool":
        return "true" if v else "false"
    if kind == "float":
        f = float(v)
        if math.isnan(f):
            return '"NaN"'  # quoted (GenericRecordJsonEncoder.java:118-124)
        if math.isinf(f):
            return '"Infinity"' if f > 0 else '"-Infinity"'
        return repr(f)
    if kind == "timestamp":  # raw epoch micros fall-through (§1.3)
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return str(ts.value // 1000)
    if kind == "date":  # raw epoch days fall-through (§1.3)
        return str((pd.Timestamp(v) - pd.Timestamp("1970-01-01")).days)
    # int/long fall-through (GenericRecordJsonEncoder.java:133-137); int(v)
    # because Arrow->pandas widens nullable int columns to float64.
    return str(int(v))


def _kind_of(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    raise TypeError(
        f"reference-fidelity encoder supports flat schemas only; got {dt} "
        "(use mode='spark' for nested struct/array/map)")


def _encode_reference_fidelity(df: DataFrame) -> DataFrame:
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(df.sparkSession)
    fields = [(f.name, _kind_of(f.dataType)) for f in df.schema.fields]

    # Arrow->pandas conflates SQL NULL with float NaN; the reference encodes
    # null as `null` but NaN as quoted "NaN", so carry explicit null masks
    # for float columns (computed JVM-side, exact).
    float_cols = [n for n, k in fields if k == "float"]
    masked = df.select(
        *df.columns,
        *[F.isnull(c).alias(f"__isnull_{c}") for c in float_cols])

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            docs = []
            n = len(fields)
            for row in pdf.itertuples(index=False):
                vals, masks = row[:n], row[n:]
                nullmask = dict(zip(float_cols, masks))
                parts = []
                for (name, kind), v in zip(fields, vals):
                    if kind == "float":
                        is_na = bool(nullmask[name])
                    elif kind in ("timestamp", "date", "int", "bool"):
                        # nullable ints/bools surface as NaN/None in pandas
                        is_na = v is None or (not isinstance(v, (bytes, str))
                                              and pd.isna(v))
                    else:
                        is_na = v is None
                    parts.append('"%s": %s' % (
                        _escape_string(name),
                        "null" if is_na else _encode_scalar(v, kind)))
                docs.append("{%s}" % ", ".join(parts))
            yield pd.DataFrame({DOC_COL: docs})

    return masked.mapInPandas(encode_batches, schema=f"{DOC_COL} string")
