"""Side-by-side migration guide: every usage pattern from the reference's
README (ArangoDB-Community/arangodb-java-parquet, README.md:8-28) and test
matrix (ParquetArangoLoaderTest.java:108-162), re-expressed on this engine.

Run it end-to-end without a server (LocalCollection); flip USE_ARANGO to
target a real ArangoDB via python-arango — the loader code is identical,
only the Collection implementation changes.

    python examples/migrate_from_reference.py [parquet_path]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.session import get_spark
from arangodb_java_parquet_spark.sources import LocalCollection, ParquetLoader
from arangodb_java_parquet_spark.sources.collections import ArangoCollectionSink

USE_ARANGO = False  # True -> python-arango against a live server


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.001/nation.parquet"
    spark = get_spark(app_name="migrate-example")

    # Reference (sync):
    #   ArangoDB arangoDB = new ArangoDB.Builder().serializer(arangoJack)...
    #   ArangoCollection myCol = db.collection("myCol");
    #   new ParquetArangoLoader().loadParquetFileIntoArango(path, myCol);
    if USE_ARANGO:
        my_col = ArangoCollectionSink("myCol", url="http://127.0.0.1:8529",
                                      database="mydb")
    else:
        my_col = LocalCollection(tempfile.mkdtemp(prefix="migrate_"), "myCol")

    loader = ParquetLoader(spark)
    n = loader.load(path, my_col)                       # append (default)
    print(f"loaded {n} documents -> {my_col.name}")

    # Reference overwrite + custom batch size
    # (loadParquetFileIntoArango(path, col, true, 3)):
    loader.load(path, my_col, overwrite=True, batch_size=3)
    print(f"after overwrite: {my_col.count()} documents")

    # Reference async (loadParquetFileIntoArangoAsync(..., maxParallelBatches)):
    # Spark task parallelism IS the async model — tune write-task count:
    loader.load(path, my_col, overwrite=True, max_parallel_batches=10)
    print(f"async-equivalent load: {my_col.count()} documents")

    # Reference logical-type converter registry
    # (loader.addTypeConverter(LogicalTypes.date(), fn)):
    loader.add_type_converter("date", lambda c: F.date_format(c, "yyyy-MM-dd"))
    loader.load(path, my_col, overwrite=True)
    print("with date converter:", my_col.count())

    # Beyond the reference: everything is a DataFrame first, so any of the
    # 325 registered analytics run on the same session before sinking:
    df = loader.read(path)
    df.groupBy("n_regionkey").count().show()


if __name__ == "__main__":
    main()
