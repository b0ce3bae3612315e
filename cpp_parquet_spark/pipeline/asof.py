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
