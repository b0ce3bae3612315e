#!/usr/bin/env python3
"""Minimal driver — the Spark equivalent of the reference's example
(examples/parquet-file-driver.cc:14-49: two REQUIRED INT32 columns of
500 values, flushed once).

Run:  python examples/encode_driver.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cpp_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from cpp_parquet_spark.engine import decode_dataframe, encode_dataframe, size_report

    spark = get_spark("encode-driver", cores=4)
    df = spark.range(500).select(
        F.col("id").cast("int").alias("first_column"),
        (F.col("id") * 2).cast("int").alias("second_column"),
    )
    chunks = encode_dataframe(df).cache()
    size_report(chunks).show(truncate=False)
    decoded = decode_dataframe(chunks, df.schema)
    assert decoded.count() == 500
    print("roundtrip OK:", decoded.orderBy("first_column").limit(3).collect())
    spark.stop()


if __name__ == "__main__":
    main()
