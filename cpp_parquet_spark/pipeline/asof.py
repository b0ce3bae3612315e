"""As-of join — a custom operator Spark lacks, expressed Spark-first.

``asof_join(left, right)`` attaches to every left row the single most
recent right row (right.ts <= left.ts) per join key — the
quotes-to-trades / last-observation-carried-forward primitive.

The naive formulations both fail at scale: a range join explodes to
O(|L| x |R|) per key, and a correlated max-subquery re-scans the right
side per left row.  The scalable pattern used here is union + ordered
window: tag both sides, union them, and carry the right side's values
forward with ``last(ignorenulls=True)`` over a per-key window ordered
by (ts, side) — right rows sort before left rows at equal timestamps,
so the match is inclusive, exactly like DuckDB's native ``ASOF JOIN ...
ON l.ts >= r.ts`` (the driver oracle).  ONE shuffle on the join key,
then a linear sorted scan per key — no joins at all in the physical
plan.

Scale note: the per-key work is a sort + linear scan (Spark sorts
within partitions; no per-key state beyond the running last values).
A pathologically hot key concentrates its history in one task — the
fix at 100 TB is time-slicing hot keys (carry the last value across
slice boundaries), which composes with this operator but is not
needed for key spaces like user_id.

Tie note (ADVICE r5): when several right rows share (key, ts), the
window orders by (ts, _side) only, so which of the tied rows wins is
not pinned — the same as DuckDB's native ASOF, whose tie choice is
likewise unspecified.  An explicit tiebreaker column would pin OUR
side without pinning the oracle's, so it is deliberately not added;
the driver events data is verified tie-free at every SF (round-6).

Caveat: a genuinely-NULL value column on the right side is
indistinguishable from "no match yet" inside the fill; pre-coalesce
such columns if that distinction matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_values: dict[str, str] | None = None,
) -> DataFrame:
    """For each left row, fill ``right_values`` ({output_name: right
    column}) from the most recent right row with right.ts <= left.ts
    and equal ``on`` keys; NULL where no prior right row exists.
    Returns all left columns plus the filled columns."""
    if right_values is None:
        right_values = {f"right_{c}": c for c in right.columns if c not in (*on, ts_col)}
    lt = F.col(ts_col).cast("timestamp")
    l_side = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[src]).alias(f"_rv_{out}") for out, src in right_values.items()],
    )
    r_side = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(src).alias(f"_rv_{out}") for out, src in right_values.items()],
    )
    # right rows carry no left payload
    for c in left.columns:
        if c not in (*on, ts_col):
            r_side = r_side.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l_side.unionByName(r_side.select(l_side.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy(lt.asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        F.col("_side"),
        *[F.last(f"_rv_{out}", ignorenulls=True).over(w).alias(out) for out in right_values],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    lower_us: int = 0,
    upper_us: int = 300_000_000,
    right_prefix: str = "r_",
) -> DataFrame:
    """Interval join: all (left, right) pairs with equal ``on`` keys and
    right.ts - left.ts in [lower_us, upper_us] microseconds — the other
    temporal-join primitive Spark lacks as a first-class operator.

    A naive theta-join is a per-key cross product; Catalyst executes it
    as BroadcastNestedLoop when it can't find an equi-key.  The
    scale-safe form here adds one: time is bucketized at width
    (upper_us - lower_us), each right row lands in exactly ONE bucket,
    and each left row's window overlaps at most TWO consecutive
    buckets — so the left side explodes 2x onto candidate buckets, the
    join is a plain equi-join on (key, bucket) (hash shuffle, AQE
    skew-splittable), and the exact interval predicate filters the
    candidates.  Each qualifying pair is produced exactly once (the
    right row's bucket is unique).  2x map-side fan-out buys the
    elimination of the per-key cross product."""
    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("upper_us must exceed lower_us")

    def ibucket(x):
        # exact integer floor-division in the LONG domain: x - pmod(x,w)
        # is exactly divisible, so the double division is exact — a
        # plain floor(x / w) on epoch-microsecond doubles can flip
        # buckets near boundaries (quotient rounding at ~2^-52)
        return ((x - F.pmod(x, F.lit(width))) / F.lit(width)).cast("long")

    lt = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # left window [lt+lower, lt+upper] spans buckets floor((lt+lower)/w)
    # and that +1; right row's bucket is floor(rt/w)
    lb = ibucket(lt + F.lit(lower_us))
    l_side = left.select(
        *left.columns,
        F.explode(F.array(lb, lb + 1)).alias("_bucket"),
        lt.alias("_lts"),
    )
    rt = F.unix_micros(F.col(ts_col).cast("timestamp"))
    r_side = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        ibucket(rt).alias("_rbucket"),
        rt.alias("_rts"),
    )
    delta = F.col("_rts") - F.col("_lts")
    joined = l_side.join(
        r_side,
        [l_side["_bucket"] == r_side["_rbucket"]]
        + [l_side[k] == r_side[f"{right_prefix}{k}"] for k in on],
        "inner",
    )
    return (
        joined.filter((delta >= lower_us) & (delta <= upper_us))
        .withColumn("gap_us", delta)
        .drop("_bucket", "_rbucket", "_lts", "_rts")
    )
