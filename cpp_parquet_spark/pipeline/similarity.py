"""Similarity search over embedding columns (array<float>).

Two paths, per the task brief:
* brute-force cosine top-k — the correctness baseline, exact and
  DuckDB-oracle-able.  Embeddings are *integerized* (round(x*1000))
  before the dot product so Spark and the SQL oracle compute identical
  integers; sqrt/division on those integers is then bit-identical IEEE
  double in both engines.
* LSH-bucketed ANN (random hyperplane signatures) — the scale path:
  candidates come from a shuffle on the bucket key instead of a cross
  join; numpy does the hyperplane math in an Arrow-batched UDF.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _int_vec(col) -> Column:
    return F.transform(col, lambda x: F.round(x * 1000).cast("long"))


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine_topk(
    df: DataFrame,
    k: int = 5,
    query_filter: str = "vec_id % 50 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    The query side is tiny (a filter) and broadcast; ranking is a
    window per query id.  Self-match is excluded.
    """
    base = df.select(F.col(id_col).alias("cid"), _int_vec(F.col(vec_col)).alias("cvec"))
    queries = df.filter(F.expr(query_filter)).select(
        F.col(id_col).alias("qid"), _int_vec(F.col(vec_col)).alias("qvec")
    )
    dot = _dot(F.col("qvec"), F.col("cvec")).cast("double")
    nq = F.sqrt(_dot(F.col("qvec"), F.col("qvec")).cast("double"))
    nc = F.sqrt(_dot(F.col("cvec"), F.col("cvec")).cast("double"))
    scored = (
        base.join(F.broadcast(queries), F.col("qid") != F.col("cid"))
        .select("qid", "cid", (dot / (nq * nc)).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 6).alias("cosine"), F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_exact(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold — exact baseline (oracle-able)."""
    v = df.select(F.col(id_col).alias("id"), _int_vec(F.col(vec_col)).alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    dot = _dot(F.col("a.vec"), F.col("b.vec")).cast("double")
    na = F.sqrt(_dot(F.col("a.vec"), F.col("a.vec")).cast("double"))
    nb = F.sqrt(_dot(F.col("b.vec"), F.col("b.vec")).cast("double"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (na * nb), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane signature per vector (Arrow-batched numpy)."""
    from pyspark.sql.pandas.functions import pandas_udf

    planes = _hyperplanes(dim, n_planes, seed)

    @pandas_udf("long")
    def bucket(vecs):
        import pandas as pd

        out = np.zeros(len(vecs), dtype=np.int64)
        mats = np.stack([np.asarray(v, dtype=np.float64) for v in vecs]) if len(vecs) else np.zeros((0, dim))
        if len(vecs):
            signs = (mats @ planes.T) > 0
            out = (signs.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket(F.col(vec_col)).alias("bucket"))


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scale path: candidates share an LSH bucket (shuffle key), then
    exact cosine verification on candidates only."""
    b = lsh_buckets(df, n_planes=n_planes, id_col=id_col, vec_col=vec_col, dim=dim)
    b = b.select("id", "bucket", _int_vec(F.col("vec")).alias("vec"))
    x, y = b.alias("a"), b.alias("b")
    dot = _dot(F.col("a.vec"), F.col("b.vec")).cast("double")
    na = F.sqrt(_dot(F.col("a.vec"), F.col("a.vec")).cast("double"))
    nb = F.sqrt(_dot(F.col("b.vec"), F.col("b.vec")).cast("double"))
    return (
        x.join(y, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (na * nb), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
