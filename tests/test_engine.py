"""End-to-end Spark engine tests: encode → decode → bit-identity.

The content-sha256 per-row equality is the north-rule invariant
(BASELINE.json input_hint); these tests are the `python -m pytest -x -q`
verification it names.
"""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark.datagen import (
    source_repos_from_documents,
    synthetic_source_repos,
)
from cpp_parquet_spark.engine import (
    decode_dataframe,
    encode_dataframe,
    encode_pipeline,
    partition_for_encoding,
    size_report,
)


def _roundtrip_check(df, keys):
    chunks = encode_dataframe(df, codec="auto").cache()
    decoded = decode_dataframe(chunks, df.schema)
    a = df.withColumn("_sha", F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns]), 256))
    b = decoded.withColumn("_sha", F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns]), 256))
    n = df.count()
    assert decoded.count() == n
    # order-insensitive exact equality via sha multiset
    diff = a.select("_sha").exceptAll(b.select("_sha")).count()
    assert diff == 0, f"{diff} rows differ after roundtrip"
    return chunks


def test_source_repos_roundtrip_sha(spark, sf_small):
    src = source_repos_from_documents(spark, sf_small)
    chunks = _roundtrip_check(src, ["repo", "path"])
    rep = {r["column"]: r for r in size_report(chunks).collect()}
    # north rule: compressed size <= reference PLAIN size, per column and total
    total_enc = sum(r["encoded_bytes"] for r in rep.values())
    total_plain = sum(r["plain_bytes"] for r in rep.values())
    assert total_enc <= total_plain
    # lang column must compress massively (12 distinct values)
    assert rep["lang"]["ratio"] > 3


def test_lineitem_roundtrip(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    _roundtrip_check(df, ["l_orderkey", "l_linenumber"])


def test_embeddings_roundtrip_lists(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    chunks = encode_dataframe(df).cache()
    decoded = decode_dataframe(chunks, df.schema)
    a = sorted(df.collect(), key=lambda r: r["vec_id"])
    b = sorted(decoded.collect(), key=lambda r: r["vec_id"])
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["vec_id"] == rb["vec_id"]
        assert ra["embedding"] == rb["embedding"]
        assert ra["label"] == rb["label"]


def test_nulls_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"v{i}", None if i % 7 == 0 else float(i)) for i in range(1000)],
        "id bigint, s string, x double",
    )
    _roundtrip_check(df, ["id"])


def test_encode_pipeline_partitions_and_salts(spark, sf_small):
    src = source_repos_from_documents(spark, sf_small)
    chunks = encode_pipeline(src, num_partitions=4).cache()
    assert chunks.select("part_id").distinct().count() <= 4
    decoded = decode_dataframe(chunks, src.schema)
    assert decoded.count() == src.count()


def test_partition_for_encoding_salting(spark):
    # skewed synthetic input: repo 0 owns ~30% of rows
    df = synthetic_source_repos(spark, 20000, parts=4)
    out = partition_for_encoding(df, num_partitions=8, target_rows=2000)
    # the skewed (lang, repo) keys must be split across >1 partition
    parts_per_key = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("repo")
        .agg(F.countDistinct("pid").alias("nparts"), F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 4000)
        .collect()
    )
    assert all(r["nparts"] > 1 for r in parts_per_key), parts_per_key


def test_synthetic_deterministic(spark):
    a = synthetic_source_repos(spark, 500).collect()
    b = synthetic_source_repos(spark, 500).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    langs = {r["lang"] for r in a}
    assert "python" in langs and len(langs) >= 6
    for r in a[:20]:
        assert len(r["commit"]) == 40
        assert 64 <= len(r["content"])


def test_list_of_struct_roundtrip(spark):
    """Multi-leaf columns under a list (array<struct<a,b,c>>) decode —
    the last hole in the Dremel story (the reference's deep-nesting
    matrix, parquet-file-test.cc:515-600, is the spirit).  Every
    leaf's def/rep stream passes through the codecs; reassembly zips
    the per-leaf wrappers back together."""
    from pyspark.sql import functions as F

    from cpp_parquet_spark.engine import decode_dataframe, encode_dataframe

    base = spark.range(0, 300).select(
        (F.col("id") % 37).alias("k"),
        F.col("id").alias("v"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") * 2).alias("w"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id")))
        .alias("s"),
    )
    nested = base.groupBy("k").agg(F.collect_list(F.struct("v", "w", "s")).alias("items"))
    dec = decode_dataframe(encode_dataframe(nested, codec="auto"), nested.schema)
    back = dec.select("k", F.explode("items").alias("i")).select(
        "k", F.col("i.v").alias("v"), F.col("i.w").alias("w"), F.col("i.s").alias("s")
    )
    src = base.select("k", "v", "w", "s")
    assert back.count() == 300
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0
