"""Python Data Source (PySpark 4 DataSourceV2 API) for document
collections: ``spark.read.format("ajps_collection")``.

This is the engine-integrated read path for the collection sink (SURVEY.md
§7 listed a DataSourceV2 integration as the optional nicety over plain
``spark.read.json``): one input partition per JSONL part file, so Spark
schedules file-parallel reads with locality, and the collection plugs into
the full DataFrame/Catalyst pipeline like any built-in source.

Usage::

    from arangodb_java_parquet_spark.sources.pyds import register
    register(spark)
    df = (spark.read.format("ajps_collection")
          .schema("n_nationkey long, n_name string, n_regionkey long")
          .option("path", collection.path).load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from arangodb_java_parquet_spark.shipping import ensure_package_shipped


class CollectionDataSource(DataSource):
    """Document-collection source: directory of JSONL part files."""

    @classmethod
    def name(cls) -> str:
        return "ajps_collection"

    def reader(self, schema) -> "CollectionReader":
        return CollectionReader(self.options, schema)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CollectionReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ajps_collection requires .option('path', ...)")
        self.field_names = schema.fieldNames()

    def partitions(self):
        # one partition per part file -> file-parallel scheduling, the same
        # split model the sink's concurrent writers produce
        files = sorted(
            os.path.join(self.path, f) for f in os.listdir(self.path)
            if f.startswith("part-") and f.endswith(".jsonl"))
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        names = self.field_names
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    doc = json.loads(line)
                    yield tuple(doc.get(n) for n in names)


def register(spark) -> None:
    """Register the collection data source with this session (idempotent).

    Ships the package to executors first — the reader class deserializes
    there by importing this module.
    """
    ensure_package_shipped(spark)
    spark.dataSource.register(CollectionDataSource)
