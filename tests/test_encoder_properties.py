"""Property-based tests (hypothesis) for the reference-fidelity JSON
encoder: every generated flat row must encode to parseable JSON that
round-trips the values under the documented reference semantics
(GenericRecordJsonEncoder.java:42-216)."""

import json
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from arangodb_java_parquet_spark.functions.docjson import (
    _encode_scalar, _escape_string)

# pure-python property tests for the per-value encoder (fast path for
# hypothesis: no Spark job per example)

text = st.text(max_size=50)


@given(text)
@settings(max_examples=200, deadline=None)
def test_escaped_strings_parse_as_json(s):
    encoded = '"%s"' % _escape_string(s)
    assert json.loads(encoded) == s


@given(st.binary(max_size=40))
@settings(max_examples=200, deadline=None)
def test_bytes_wrapper_roundtrips_iso88591(b):
    doc = json.loads(_encode_scalar(b, "bytes"))
    # {"bytes": "<ISO-8859-1>"} wrapper; decoding is byte-preserving
    assert doc["bytes"].encode("ISO-8859-1") == b


@given(st.floats(allow_nan=True, allow_infinity=True))
@settings(max_examples=200, deadline=None)
def test_float_encoding_reference_semantics(f):
    out = _encode_scalar(f, "float")
    if math.isnan(f):
        assert out == '"NaN"'
    elif math.isinf(f):
        assert out in ('"Infinity"', '"-Infinity"')
    else:
        assert json.loads(out) == f


@given(st.integers(min_value=-2**63, max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_int_encoding(i):
    assert json.loads(_encode_scalar(i, "int")) == i


@given(st.text(max_size=30))
@settings(max_examples=100, deadline=None)
def test_control_ranges_always_escaped(s):
    encoded = _escape_string(s)
    for ch in encoded:
        cp = ord(ch)
        # after escaping, no raw control chars or U+2000-U+20FF remain
        assert not (cp <= 0x1F or 0x7F <= cp <= 0x9F or 0x2000 <= cp <= 0x20FF)


def test_spark_encode_random_rows_parse(spark):
    """One Spark-side sweep: random-ish rows through the full mapInPandas
    path parse as JSON with reference field order."""
    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BinaryType()),
    ])
    rows = [
        ("x y\x00z", 1, 1.25, b"\x00\xff"),
        ("", 0, float("nan"), b""),
        (None, None, None, None),
        ('"quoted"\\back', -2**62, -0.0, bytes(range(16))),
    ]
    from arangodb_java_parquet_spark.functions.docjson import encode_documents
    df = spark.createDataFrame(rows, schema).coalesce(1)
    docs = [r[0] for r in encode_documents(df, mode="reference").collect()]
    for d in docs:
        parsed = json.loads(d)
        assert list(parsed.keys()) == ["s", "i", "d", "b"]
