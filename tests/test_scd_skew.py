"""Unit tests for the SCD2 merge and salted-join operators."""

import datetime

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.operators.scd import scd2_merge
from arangodb_java_parquet_spark.operators.skew import salted_join

D = datetime.date


def test_scd2_merge_all_cases(spark):
    dim = spark.createDataFrame(
        [(1, 10.0, D(2020, 1, 1), None),         # will change
         (2, 20.0, D(2020, 1, 1), None),         # update, same value
         (3, 30.0, D(2020, 1, 1), None),         # no update
         (1, 5.0, D(2019, 1, 1), D(2020, 1, 1))],  # closed history
        "key long, bal double, valid_from date, valid_to date")
    upd = spark.createDataFrame(
        [(1, 11.0, D(2021, 6, 1)),
         (2, 20.0, D(2021, 6, 1)),
         (9, 90.0, D(2021, 6, 1))],              # brand-new key
        "key long, bal double, eff_date date")
    got = sorted(map(tuple, scd2_merge(
        dim, upd, key="key", attrs=["bal"]).collect()))
    assert got == sorted([
        (1, 5.0, D(2019, 1, 1), D(2020, 1, 1)),   # history untouched
        (1, 10.0, D(2020, 1, 1), D(2021, 6, 1)),  # closed
        (1, 11.0, D(2021, 6, 1), None),           # re-opened
        (2, 20.0, D(2020, 1, 1), None),           # unchanged passthrough
        (3, 30.0, D(2020, 1, 1), None),           # no update
        (9, 90.0, D(2021, 6, 1), None),           # new key
    ])


def test_scd2_merge_null_safe_attr_compare(spark):
    dim = spark.createDataFrame(
        [(1, None, D(2020, 1, 1), None)],
        "key long, bal double, valid_from date, valid_to date")
    upd = spark.createDataFrame(
        [(1, None, D(2021, 1, 1))],
        "key long, bal double, eff_date date")
    out = scd2_merge(dim, upd, key="key", attrs=["bal"]).collect()
    # NULL == NULL counts as unchanged: single passthrough row
    assert [tuple(r) for r in out] == [(1, None, D(2020, 1, 1), None)]


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(200)], "k long, payload long")
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (1, "c")], "k long, tag string")
    got = sorted(map(tuple,
                     salted_join(big, small, "k", n_salts=4,
                                 salt_src="payload").collect()))
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(400)], "k long, payload long")
    small = spark.createDataFrame([(1, "hot")], "k long, tag string")
    from arangodb_java_parquet_spark.operators.skew import F as _F  # noqa
    salt = (F.conv(F.substring(
        F.md5(F.concat(F.lit("salt:"), F.col("payload").cast("string"))),
        1, 8), 16, 10).cast("long") % 4)
    n_salts_used = big.select(salt.alias("s")).distinct().count()
    assert n_salts_used == 4  # the hot key really fans out
    assert salted_join(big, small, "k", n_salts=4,
                       salt_src="payload").count() == 400
