"""Example: write REAL .parquet files with the engine's own writer and
read them back with three independent readers.

    spark-submit --py-files cpp_parquet_spark examples/write_real_parquet.py

Mirrors the reference driver's flow (examples/parquet-file-driver.cc /
parquet-file-writer.cc) on Spark: the distributed sink writes one part
file per task (dictionary pages + statistics, optional gzip), then
Spark, pyarrow and DuckDB all parse the output.
"""

import sys
import tempfile

import duckdb
import pyarrow.parquet as pq

from pyspark.sql import SparkSession, functions as F

from cpp_parquet_spark.session import apply_malloc_env
from cpp_parquet_spark.sink import write_parquet_dir


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    apply_malloc_env()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("write-real-parquet")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(4, "lang")
    out = tempfile.mkdtemp(prefix="real_parquet_")
    manifest = write_parquet_dir(docs, out, compression="gzip")
    for row in manifest:
        print(f"wrote {row['file']}: {row['rows']} rows, {row['bytes']} bytes")

    # three independent readers agree
    n_spark = spark.read.parquet(out).count()
    n_arrow = pq.read_table(out).num_rows
    n_duck = duckdb.sql(f"select count(*) from '{out}/*.parquet'").fetchone()[0]
    assert n_spark == n_arrow == n_duck == docs.count()
    print(f"spark/pyarrow/duckdb all read {n_spark} rows back")

    by_lang = spark.read.parquet(out).groupBy("lang").agg(F.count("*").alias("n"))
    by_lang.show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
