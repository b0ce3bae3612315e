#!/usr/bin/env python3
"""Round-6 measurement harness (guide §1): phase-split timings and plan
captures for the driver-timed bench queries, using the noop sink so the
computation is timed without the collect/write cost.  bench.py itself is
frozen for measurement; this file cites its numbers in
OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py phases      # encode/decode phase decomposition
  python bench_extra.py queries     # per-declared-query noop timings
  python bench_extra.py plans       # dump .explain('formatted') files
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # frozen harness: reuse its session/config/input exactly

SF_DIR = bench.SF_DIR
WORK = bench.WORK


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def timed(label: str, fn, n: int = 3) -> list[float]:
    out = []
    for _ in range(n):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    print(f"[extra] {label}: {out}", flush=True)
    return out


def phases() -> None:
    from pyspark.sql import functions as F

    from cpp_parquet_spark.engine import (
        decode_dataframe,
        encode_dataframe,
        encode_pipeline,
        partition_for_encoding,
        presample_codecs,
    )

    spark = bench.make_session(bench.CPUS)
    input_path = f"{WORK}/input.parquet"
    chunks_path = f"{WORK}/chunks.parquet"
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        bench.prepare_input(spark, input_path)
    bench.warm_workers(spark, input_path)
    hints = presample_codecs(spark.read.parquet(input_path))
    df = spark.read.parquet(input_path)
    n_parts = bench.CPUS * 2

    spark.sparkContext.setJobDescription("phase: skew-sample job only")

    def skew_job():
        frac = 0.001
        (df.sample(fraction=frac, seed=42).groupBy("lang", "repo").count()
         .filter(F.col("count") > 131).collect())

    timed("skew-sample job", skew_job)

    spark.sparkContext.setJobDescription("phase: repartition+count only (shuffle, no python)")
    part = partition_for_encoding(df, num_partitions=n_parts, salt=True)
    timed("repartition+noop (shuffle only)", lambda: noop(part))

    spark.sparkContext.setJobDescription("phase: full encode_pipeline + agg (bench shape)")
    timed("bench run_encode", lambda: bench.run_encode(spark, input_path, codec_hints=hints)[0])

    spark.sparkContext.setJobDescription("phase: encode, no salt job (hints, presample off)")

    def enc_nosalt():
        chunks = encode_dataframe(
            partition_for_encoding(df, num_partitions=n_parts, salt=False),
            codec="auto", codec_hints=hints)
        chunks.groupBy().agg(F.sum("plain_bytes"), F.sum("encoded_bytes")).collect()

    timed("encode w/o skew job", enc_nosalt)

    spark.sparkContext.setJobDescription("phase: encode agg only noop")

    def enc_noop():
        chunks = encode_pipeline(df, codec="auto", num_partitions=n_parts, codec_hints=hints)
        noop(chunks)

    timed("encode_pipeline noop", enc_noop)

    # make sure chunks.parquet exists for decode
    if not os.path.exists(os.path.join(chunks_path, "_SUCCESS")):
        bench.run_encode(spark, input_path, chunks_out=chunks_path, codec_hints=hints)

    spark.sparkContext.setJobDescription("phase: decode (bench shape)")
    timed("bench run_decode", lambda: bench.run_decode(spark, chunks_path))

    schema = spark.read.parquet(input_path).schema
    chunks = spark.read.parquet(chunks_path)
    dec = decode_dataframe(chunks, schema)
    print("[extra] decode plan:", flush=True)
    dec.explain("formatted")

    spark.sparkContext.setJobDescription("phase: decode noop")
    timed("decode noop", lambda: noop(decode_dataframe(chunks, schema)))

    # roundtrip queries, bench estimator shape (collect)
    import __spark_entry__ as entrymod

    for name in ("roundtrip_content", "roundtrip_lineitem_agg"):
        fn = entrymod.queries()[name]
        spark.sparkContext.setJobDescription(f"phase: {name}")
        timed(name + " collect", lambda: fn(spark, SF_DIR).collect())

    bench.hard_stop(spark)


def queries(only: list[str] | None = None) -> None:
    """noop-sink timing of every declared query at SF_DIR."""
    import __spark_entry__ as entrymod

    spark = bench.make_session(bench.CPUS)
    results = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"query: {name}")
        try:
            t = timed(name, lambda: noop(fn(spark, SF_DIR)), n=2)
            results[name] = min(t)
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERR {type(e).__name__}: {e}"
            print(f"[extra] {name} ERROR {e}", flush=True)
    print(json.dumps(results, indent=2))
    bench.hard_stop(spark)


def plans(names: list[str], tag: str) -> None:
    """Dump .explain('formatted') for the named queries to plans/r06/."""
    import contextlib
    import io

    import __spark_entry__ as entrymod

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = bench.make_session(bench.CPUS)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"[extra] wrote {path}", flush=True)
    bench.hard_stop(spark)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "phases"
    if cmd == "phases":
        phases()
    elif cmd == "queries":
        queries(sys.argv[2].split(",") if len(sys.argv) > 2 else None)
    elif cmd == "plans":
        plans(sys.argv[2].split(","), sys.argv[3] if len(sys.argv) > 3 else "before")
    else:
        raise SystemExit(f"unknown command {cmd}")
