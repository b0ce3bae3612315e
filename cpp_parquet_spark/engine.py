"""The Spark-side engine: distributed encode/decode pipelines.

This is the Spark equivalent of the reference's writer lifecycle
(SURVEY.md §3): where cpp-parquet buffers whole columns in one process
and flushes once (parquet-file.cc:118-177), this engine expresses the
same ingest → shred → encode → serialize dataflow as

    df.repartition(N, lang, repo, salt)          # explicit shuffle
      .mapInArrow(encode_batches, CHUNK_SCHEMA)  # vectorized encoders

with every per-value operation inside numpy/Arrow kernels — no per-row
Python (input_hint).  Decoding is the inverse mapInArrow over chunk
rows grouped per (part_id, chunk_id).

Scale notes (designed for ~100 TB / 1000 executors, tested local[32]):
* the only full-data shuffle is the explicit repartition; its key set
  (lang, repo, salt) is what makes rle/dict win on lang/repo columns
  downstream, so the shuffle buys compression;
* skewed repos are salted: a cheap combine-side (lang, repo) count
  finds keys above the target partition size and splits them;
* chunk rows are bounded (``chunk_rows``) so executor memory per task
  is bounded regardless of input size;
* chunk metadata (one row per column chunk) is ~6 rows per 64k input
  rows — the metadata table is ~1e5 smaller than the data, safe to
  aggregate/collect.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cpp_parquet_spark.schema_plan import ColumnPlan, plan_from_schema

CHUNK_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("chunk_id", LongType(), False),
        StructField("column", StringType(), False),
        StructField("codec", StringType(), False),
        StructField("physical", StringType(), False),
        StructField("num_rows", LongType(), False),
        StructField("num_entries", LongType(), False),
        StructField("num_values", LongType(), False),
        StructField("plain_bytes", LongType(), False),
        StructField("plain_value_bytes", LongType(), False),
        StructField("encoded_bytes", LongType(), False),
        StructField("encode_ms", LongType(), False),
        StructField("stat_min", BinaryType(), True),
        StructField("stat_max", BinaryType(), True),
        StructField("payload", BinaryType(), False),
    ]
)

_CHUNK_ARROW = pa.schema(
    [
        ("part_id", pa.int32()),
        ("chunk_id", pa.int64()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("physical", pa.string()),
        ("num_rows", pa.int64()),
        ("num_entries", pa.int64()),
        ("num_values", pa.int64()),
        ("plain_bytes", pa.int64()),
        ("plain_value_bytes", pa.int64()),
        ("encoded_bytes", pa.int64()),
        ("encode_ms", pa.int64()),
        ("stat_min", pa.binary()),
        ("stat_max", pa.binary()),
        ("payload", pa.binary()),
    ]
)

DEFAULT_CHUNK_ROWS = 1 << 16


def _arrow_schema_for(df: DataFrame) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


def _encode_table(
    table: pa.Table,
    plans: list[ColumnPlan],
    codec_mode: str,
    part_id: int,
    chunk_id: int,
    memo: dict | None = None,
) -> pa.RecordBatch:
    from cpp_parquet_spark.chunk import serialize_chunk
    from cpp_parquet_spark.kernels.levels import shred
    from cpp_parquet_spark.selector import select_codec
    from cpp_parquet_spark.stats import chunk_stats

    import time

    rows: list[tuple] = []
    n_rows = table.num_rows
    for plan in plans:
        t0 = time.time()
        col = table.column(plan.path[0])
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        sh = shred(arr, plan)
        # per-task codec memo: at pipeline chunk sizes the trial-encode
        # selection costs as much as encoding itself; consecutive chunks
        # of one partition are near-identically distributed (the shuffle
        # clusters them), so reuse the last choice and fall back below
        # if it drifts
        memoized = memo is not None and plan.dotted in memo
        if memoized:
            codec = memo[plan.dotted]
            if codec == "fsst" and sh.values.nbytes > 32e6:
                # re-apply the selector's own payload cap
                # (selector.py:126) at chunk level: a memoized/hinted
                # fsst must not capture a content-sized chunk that
                # per-chunk selection would have cap-gated — fsst
                # encodes at ~12 MB/s/core (r5 measured, blocked
                # replay; gated by test_fsst_encode_throughput_gate)
                # and the size-based drift guard cannot catch a
                # slow-but-compressing codec
                codec = select_codec(sh.values, plan.physical, mode=codec_mode)
                memo[plan.dotted] = codec
        else:
            codec = select_codec(sh.values, plan.physical, mode=codec_mode)
            if memo is not None:
                memo[plan.dotted] = codec
        try:
            blob, meta = serialize_chunk(sh, codec)
        except (ValueError, TypeError, pa.lib.ArrowNotImplementedError, pa.lib.ArrowInvalid):
            # a sample-based codec assumption failed on the full chunk
            # (e.g. alpha alphabet overflow) — PLAIN always works
            codec = "plain"
            blob, meta = serialize_chunk(sh, codec)
        if memoized and meta.encoded_bytes > meta.plain_bytes:
            # drift guard: the memoized codec lost to PLAIN — reselect.
            # The reselected codec gets the same failure fallback as the
            # first attempt (a sample-based choice can still fail on the
            # full chunk, e.g. alpha alphabet overflow).
            codec = select_codec(sh.values, plan.physical, mode=codec_mode)
            try:
                blob, meta = serialize_chunk(sh, codec)
            except (ValueError, TypeError, pa.lib.ArrowNotImplementedError, pa.lib.ArrowInvalid):
                codec = "plain"
                blob, meta = serialize_chunk(sh, codec)
            memo[plan.dotted] = codec
        rows.append(
            (
                part_id,
                chunk_id,
                plan.dotted,
                codec,
                plan.physical,
                n_rows,
                meta.num_entries,
                meta.num_values,
                meta.plain_bytes,
                meta.plain_value_bytes,
                meta.encoded_bytes,
                int((time.time() - t0) * 1000),
                *chunk_stats(sh.values),
                blob,
            )
        )
    cols = list(zip(*rows))
    return pa.RecordBatch.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, _CHUNK_ARROW)], schema=_CHUNK_ARROW
    )


def presample_codecs(df: DataFrame, rows: int = 8192, mode: str = "auto") -> dict[str, str]:
    """Driver-side codec pre-selection: run the selector once on a small
    prefix sample and return {leaf column -> codec} hints.

    Cold-start selection (trial-encoding every column on each task's
    first chunk) measured ~190 ms per task; at 10^6 tasks that is ~50
    CPU-hours of pure overhead.  One tiny driver job replaces it; the
    per-task drift guard still corrects any chunk where the hinted
    codec loses to PLAIN, and the periodic memo refresh re-runs true
    selection every ``_RESELECT`` chunks for long tasks.
    """
    from cpp_parquet_spark.kernels.levels import shred
    from cpp_parquet_spark.selector import select_codec

    tbl = df.limit(rows).toArrow()
    hints: dict[str, str] = {}
    for plan in plan_from_schema(_arrow_schema_for(df)):
        col = tbl.column(plan.path[0])
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        sh = shred(arr, plan)
        if plan.physical == "BYTE_ARRAY" and len(sh.values):
            avg_len = sh.values.nbytes / max(len(sh.values), 1)
            if avg_len > 64:
                # long-string codecs are size-dependent (lined's line
                # dictionary needs many rows to pay off; fsst wins on
                # small trials) — a prefix-sample hint mis-ranks them
                # (measured: content hinted fsst = 3.1x vs per-chunk
                # lined = 9.9x).  Leave such columns to true per-chunk
                # selection.
                continue
        hints[plan.dotted] = select_codec(sh.values, plan.physical, mode=mode)
    return hints


def encode_dataframe(
    df: DataFrame,
    codec: str = "auto",
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    part_col: str | None = None,
    codec_hints: dict[str, str] | None = None,
) -> DataFrame:
    """Encode every column of ``df`` into compressed column chunks.

    Returns the chunk-metadata DataFrame (CHUNK_SCHEMA): one row per
    (partition, chunk, column) carrying the serialized chunk payload.

    With ``part_col`` set, that integer column is a *deterministic*
    partition key (a content hash, not a task id): chunks are split at
    its boundaries and ``part_id`` takes its value, which is what makes
    checkpoint/resume (lineage.EncodeJob) able to re-derive and skip
    completed partitions.  The caller must have repartitioned and
    sorted by it.  Without it, ``part_id`` is the Spark partition id.

    ``codec_hints`` (from :func:`presample_codecs`) seeds each task's
    codec memo so the first chunk skips trial-encode selection; the
    drift guard and periodic refresh keep the choice adaptive.
    """
    data_fields = [f for f in _arrow_schema_for(df) if f.name != part_col]
    plans = plan_from_schema(pa.schema(data_fields))

    def encode_batches(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np
        from pyspark import TaskContext

        ctx = TaskContext.get()
        task_part = ctx.partitionId() if ctx is not None else 0

        pending: list[pa.RecordBatch] = []
        pending_rows = 0
        chunk_id = 0
        cur_part = task_part
        # column -> codec, seeded from driver-side hints (skips the
        # cold-start trial-encode), refreshed every _RESELECT chunks
        memo: dict = dict(codec_hints or {})
        _RESELECT = 16

        def flush() -> pa.RecordBatch:
            nonlocal pending, pending_rows, chunk_id
            if chunk_id % _RESELECT == 0 and chunk_id > 0:
                memo.clear()
            tbl = pa.Table.from_batches(pending)
            out = _encode_table(tbl, plans, codec, cur_part, chunk_id, memo=memo)
            chunk_id += 1
            pending, pending_rows = [], 0
            return out

        for b in batches:
            if part_col is None:
                pending.append(b)
                pending_rows += b.num_rows
                if pending_rows >= chunk_rows:
                    yield flush()
                continue
            parts = np.asarray(b.column(part_col))
            data = b.select([f.name for f in data_fields])
            # split the batch at part boundaries (sorted within partition)
            bounds = np.flatnonzero(np.diff(parts)) + 1
            pieces = np.split(np.arange(len(parts)), bounds)
            for piece in pieces:
                if not len(piece):
                    continue
                pval = int(parts[piece[0]])
                if pval != cur_part:
                    if pending_rows:
                        yield flush()
                    chunk_id = 0  # chunk ids start at 0 per partition, even
                    # when the previous part ended exactly on a flush
                    memo.clear()  # new partition: data distribution changes
                cur_part = pval
                pending.append(data.slice(int(piece[0]), len(piece)))
                pending_rows += len(piece)
                if pending_rows >= chunk_rows:
                    yield flush()
        if pending_rows:
            yield flush()

    return df.mapInArrow(encode_batches, CHUNK_SCHEMA)


def _merge_columns(field: pa.Field, cols: list[pa.Array]) -> pa.Array:
    """Merge per-leaf rebuilt columns into one nested column.

    Each leaf of a multi-leaf column (struct, list-of-struct, …) is
    decoded independently by ``unshred`` into the full nesting with a
    single-child struct at each struct level.  All leaves of one column
    share their repetition/definition streams above the leaf, so the
    rebuilt wrappers are element-wise identical: lists are merged by
    reusing the first leaf's offsets/validity around the recursively
    merged children; structs zip their single-child wrappers together.
    (The reference's nested test matrix, parquet-file-test.cc:515-600,
    is the spirit of the covering tests.)
    """
    import numpy as np
    import pyarrow.compute as pc

    if len(cols) == 1:
        return cols[0]
    t = field.type
    if pa.types.is_map(t):
        # leaves rebuilt as list<struct<key>> / list<struct<value>>;
        # zip the entry structs, then re-type the list as a MapArray
        # (identical physical layout) keeping offsets + validity
        c0 = cols[0]
        entries_field = pa.field(
            "entries", pa.struct([t.key_field.with_name("key"), t.item_field.with_name("value")]), nullable=False
        )
        merged = _merge_columns(entries_field, [c.values for c in cols])
        built = pa.ListArray.from_arrays(c0.offsets, merged)
        if c0.null_count:
            idx = pa.array(np.arange(len(c0), dtype=np.int64), mask=np.asarray(pc.is_null(c0)))
            built = built.take(idx)
        return pa.Array.from_buffers(
            t, len(built), [built.buffers()[0], built.buffers()[1]], children=[built.values]
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        c0 = cols[0]
        assert all(len(c.values) == len(c0.values) for c in cols[1:])
        merged = _merge_columns(t.value_field, [c.values for c in cols])
        cls = pa.LargeListArray if pa.types.is_large_list(t) else pa.ListArray
        built = cls.from_arrays(c0.offsets, merged)
        if c0.null_count:
            idx = pa.array(
                np.arange(len(c0), dtype=np.int64), mask=np.asarray(pc.is_null(c0))
            )
            built = built.take(idx)
        return built
    if not pa.types.is_struct(t):
        raise NotImplementedError(f"multi-leaf reassembly under type {t} is not supported")
    by_child: dict[str, list[pa.Array]] = {}
    for c in cols:
        name = c.type.field(0).name
        by_child.setdefault(name, []).append(c.field(0) if hasattr(c, "field") else c)
    children = []
    for child_field in t:
        sub = by_child[child_field.name]
        children.append(_merge_columns(child_field, sub))
    mask = pc.invert(cols[0].is_valid()) if field.nullable else None
    return pa.StructArray.from_arrays(children, fields=list(t), mask=mask)


def decode_dataframe(
    chunks: DataFrame,
    schema: StructType,
    predicate: tuple[str, object, object] | None = None,
    grouped: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Inverse of :func:`encode_dataframe`: chunk rows → original table.

    ``predicate=(column, lower, upper)`` (either bound may be None)
    routes the scan through :func:`prune_chunks` first, so chunks whose
    stats prove them out of range never leave the JVM — their payloads
    are neither shuffled nor handed to a Python worker.  This is the
    default pushdown surface for the SGC store (round-3 item #7 /
    round-4 item #4): callers get pruning by passing the predicate they
    would otherwise apply post-decode (pruning is conservative; still
    apply the exact filter after decoding).

    ``grouped=True`` asserts that ``chunks`` is already clustered by
    (part_id, chunk_id) within its partitions — true by construction
    for the direct in-plan output of :func:`encode_dataframe` (each
    encode task emits whole chunk groups contiguously) — and skips the
    repartition+sort entirely: the decode chains narrowly onto the
    encode with no Exchange (round-6, guide §2.4).  With a
    ``predicate`` the pruning then runs as a JVM-side group-wise window
    filter on the single decode exchange instead of the semi-join,
    because the semi-join's broadcast build side would re-execute the
    whole upstream encode (measured: pruned_scan_agg ran encode twice).

    ``num_partitions`` sizes the decode exchange explicitly (default
    ``defaultParallelism``: one wave, one decode task per core).
    Without it, AQE coalesces the ~10x-compressed chunk shuffle to its
    advisory size and the decode — whose output re-expands by the
    compression ratio — runs nearly serial (measured: 5 of 64
    partitions survived coalescing at sf0.1; explicit one-wave sizing
    measured 0.52-0.63 s vs 0.66-1.15 s.  Guide §2.2/§2.5: size
    partitions for the *decoded* side).
    """
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    plans = plan_from_schema(arrow_schema)

    if grouped:
        if predicate is not None:
            col, lower, upper = predicate
            n = num_partitions or chunks.sparkSession.sparkContext.defaultParallelism
            from pyspark.sql import Window

            cond = _prune_condition(chunks, schema, col, lower=lower, upper=upper)
            if cond is not None:
                w = Window.partitionBy("part_id", "chunk_id")
                chunks = (
                    chunks.repartition(n, "part_id", "chunk_id")
                    .withColumn("__keep", F.max(cond.cast("int")).over(w))
                    .filter(F.col("__keep") == 1)
                    .drop("__keep")
                )
        grouped_df = chunks
    else:
        if predicate is not None:
            col, lower, upper = predicate
            chunks = prune_chunks(chunks, schema, col, lower=lower, upper=upper)
        n = num_partitions or chunks.sparkSession.sparkContext.defaultParallelism
        grouped_df = chunks.repartition(n, "part_id", "chunk_id").sortWithinPartitions(
            "part_id", "chunk_id"
        )

    def decode_batches(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from cpp_parquet_spark.chunk import decode_chunk_to_column

        current: tuple | None = None
        payloads: dict[str, bytes] = {}

        def flush() -> pa.RecordBatch:
            arrays = []
            for f in arrow_schema:
                leaf_cols = [
                    decode_chunk_to_column(payloads[p.dotted], p)
                    for p in plans
                    if p.path[0] == f.name
                ]
                arrays.append(_merge_columns(f, leaf_cols))
            return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

        for b in batches:
            part_ids = b.column("part_id")
            chunk_ids = b.column("chunk_id")
            names = b.column("column")
            pay = b.column("payload")
            for i in range(b.num_rows):
                key = (part_ids[i].as_py(), chunk_ids[i].as_py())
                if current is not None and key != current and payloads:
                    yield flush()
                    payloads = {}
                current = key
                payloads[names[i].as_py()] = pay[i].as_py()
        if payloads:
            yield flush()

    return grouped_df.mapInArrow(decode_batches, schema)


def prune_chunks(
    chunks: DataFrame,
    schema: StructType,
    column: str,
    lower=None,
    upper=None,
) -> DataFrame:
    """Stats-based chunk pruning: keep only chunks whose ``column`` may
    contain a value in ``[lower, upper]`` (either bound optional).

    This is predicate pushdown for the SGC chunk store — the analogue
    of the Parquet row-group statistics our writer emits
    (parquet_writer._statistics) and of the reference's ColumnMetaData
    statistics slot.  The filter runs JVM-side on the (tiny) metadata
    columns via the order-preserving ``stat_min``/``stat_max`` binary
    keys (stats.py), so pruned chunk *payloads* are never shuffled to a
    Python worker; survivors are selected per (part_id, chunk_id) with
    a broadcast semi-join so all columns of a surviving chunk stay
    aligned for :func:`decode_dataframe`.

    Pruning is conservative (truncated string stats round outward);
    callers still apply the exact predicate after decoding.  Chunks
    whose ``column`` is entirely NULL are pruned when any bound is set
    — NULL satisfies no range predicate.  For leaf columns under
    lists, the semantics are "some element in range".

    NULL-stat semantics: all-null/empty is detected by ``num_values ==
    0`` (the defined-value count recorded at encode time), NOT by NULL
    stat keys — a chunk with live values whose stats computation failed
    (chunk_stats returns (None, None) on e.g. ArrowNotImplementedError)
    has ``stat_min`` NULL but ``num_values > 0`` and is always KEPT
    (ADVICE r4: treating it as all-null silently dropped live rows).  A
    chunk whose max is not expressible as a truncated key (first 64
    bytes all 0xFF, stats._bytes_key) has ``stat_min`` set but
    ``stat_max`` NULL, meaning "unbounded above" — such a chunk is
    always KEPT under a lower-bound predicate.  An unorderable bound
    raises rather than building a silently-NULL predicate.
    """
    cond = _prune_condition(chunks, schema, column, lower=lower, upper=upper)
    if cond is None:
        return chunks
    surviving = chunks.filter(cond).select("part_id", "chunk_id")
    return chunks.join(F.broadcast(surviving), ["part_id", "chunk_id"], "leftsemi")


def _prune_condition(chunks: DataFrame, schema: StructType, column: str, lower=None, upper=None):
    """The JVM-side per-chunk-row "may contain a value in range"
    condition shared by :func:`prune_chunks` (semi-join form) and the
    grouped window prune in :func:`decode_dataframe`.  Returns None when
    no bound is set (nothing to prune).  Semantics documented on
    :func:`prune_chunks`."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import to_arrow_schema

    from cpp_parquet_spark.stats import order_key

    plans = {p.dotted: p for p in plan_from_schema(to_arrow_schema(schema))}
    if column not in plans:
        raise KeyError(f"unknown leaf column {column!r}; have {sorted(plans)}")
    dtype = plans[column].arrow_type
    if lower is None and upper is None:
        return None
    # all-null/empty chunks (num_values == 0) satisfy no range
    # predicate; chunks with live values but NULL stat keys (stats
    # computation unavailable) must survive every range condition.
    pred = (F.col("column") == column) & (F.col("num_values") > 0)
    range_ok = F.lit(True)
    if lower is not None:
        lo_key = order_key(lower, dtype, round_up=False)
        if lo_key is None:
            raise ValueError(f"no order-preserving key for lower bound {lower!r} of dtype {dtype}")
        # stat_max NULL with stat_min set = "unbounded above": keep.
        range_ok = range_ok & ((F.col("stat_max") >= F.lit(lo_key)) | F.col("stat_max").isNull())
    if upper is not None:
        hi_key = order_key(upper, dtype, round_up=True)
        if hi_key is None:
            if order_key(upper, dtype, round_up=False) is None:
                raise ValueError(f"no order-preserving key for upper bound {upper!r} of dtype {dtype}")
            # upper rounds up past every expressible key (0xFF-prefixed
            # var-length bound): the upper conjunct is vacuously true.
        else:
            range_ok = range_ok & (F.col("stat_min") <= F.lit(hi_key))
    return pred & (F.col("stat_min").isNull() | range_ok)


def _row_bytes_expr(df: DataFrame):
    """Cheap per-row PLAIN-ish byte estimate (JVM expressions only) for
    the bytes-aware salting in :func:`partition_for_encoding`.  Var-
    length columns count 4+octet_length (the reference's BYTE_ARRAY
    accounting, parquet-column.cc:367-381); fixed-width types their
    width; complex types a token constant (the rows-based target still
    guards them)."""
    from pyspark.sql import types as T

    exprs = []
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.StringType, T.BinaryType)):
            exprs.append(F.lit(4) + F.coalesce(F.octet_length(F.col(f.name)), F.lit(0)))
        elif isinstance(dt, (T.LongType, T.DoubleType, T.TimestampType, T.TimestampNTZType)):
            exprs.append(F.lit(8))
        elif isinstance(dt, (T.IntegerType, T.FloatType, T.DateType, T.ShortType)):
            exprs.append(F.lit(4))
        elif isinstance(dt, (T.BooleanType, T.ByteType)):
            exprs.append(F.lit(1))
        else:
            exprs.append(F.lit(16))
    total = exprs[0]
    for e in exprs[1:]:
        total = total + e
    return total.cast("long")


def partition_for_encoding(
    df: DataFrame,
    keys: tuple[str, ...] = ("lang", "repo"),
    num_partitions: int | None = None,
    target_rows: int = 1 << 20,
    salt: bool = True,
) -> DataFrame:
    """Explicit repartition by the encoding keys, salting skewed keys.

    The (lang, repo) clustering is what makes the rle/dict codecs win on
    those columns; ``salt`` splits any key owning more than
    ``target_rows`` rows (north-rule skew handling) using a cheap
    map-side-combined count that only collects the skewed keys.

    Round-6 (guide §2.5): skew is detected by *bytes* as well as rows.
    The same sample job additionally estimates per-key and total row
    bytes (one rollup — still a single two-stage job), and any key
    whose estimated bytes exceed the per-partition byte budget
    ``clamp(total_bytes / num_partitions, 4 MB, 1 GB)`` is split to
    that budget.  The rows-only rule never fired below ~10^6-row keys,
    so a single 20-MB repo serialized a whole encode stage behind one
    straggler task (measured: max/median partition bytes 7x at sf0.1).
    The budget adapts to input size and partition count rather than a
    constant tuned for either local mode or the cluster; splitting
    keeps each salt bucket's rows on one key, so dict/rle clustering
    within buckets is preserved.

    Known sampling limitation: detection rides the row-count sampling
    fraction, so a key that is byte-heavy but row-LIGHT (a handful of
    near-budget-sized rows) can be missed by the sample entirely —
    per-key byte totals are unknowable without reading lengths, and
    the fraction is sized for the row target.  Such rows also exceed
    chunk/Arrow batch sizing assumptions elsewhere; a dedicated
    giant-row pre-filter would be the fix if such data appears.
    """
    spark = df.sparkSession
    num = num_partitions or spark.sparkContext.defaultParallelism * 2
    key_cols = [F.col(k) for k in keys]
    salt_col = F.lit(0)
    if salt:
        # skew detection on a deterministic sample: at 100 TB a full
        # count is a whole extra input scan; a 1% sample finds every
        # key that matters (a key owning >target_rows rows appears
        # >target_rows/100 times in the sample w.h.p.)
        frac = min(1.0, max(0.001, 100.0 / max(target_rows, 1)))
        # collection flood control: only keys whose *sampled* bytes
        # could plausibly exceed the lowest possible budget are
        # collected.  The pre-job budget guess uses the optimizer's
        # size estimate (compressed file bytes — an underestimate, so
        # the filter only over-collects by the compression ratio,
        # bounded at O(num_partitions) keys).
        try:
            plan_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:  # noqa: BLE001 - stats are a best-effort hint
            plan_bytes = 0
        if plan_bytes >= 1 << 60:
            # missing statistics surface as the defaultSizeInBytes
            # sentinel (Long.MaxValue-ish); treating it as a real size
            # would push the collection filter past every key and
            # silently disable byte salting
            plan_bytes = 0
        # cap at 2 GB: the salt budget itself is capped at 1 GB, so a
        # key above budget always samples past floor*frac*0.5 and is
        # collected even when the stats overestimate
        collect_floor = min(max(4 << 20, plan_bytes // max(num * 4, 1)), 2 << 30)
        gid_all = (1 << len(keys)) - 1
        agg_rows = (
            df.sample(fraction=frac, seed=42)
            .rollup(*keys)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(_row_bytes_expr(df)).alias("b"),
                F.grouping_id().alias("gid"),
            )
            .filter(
                (F.col("gid") == gid_all)
                | (
                    (F.col("gid") == 0)
                    & (
                        (F.col("n") > int(target_rows * frac * 0.5))
                        | (F.col("b") > int(collect_floor * frac * 0.5))
                    )
                )
            )
            .collect()
        )
        total_bytes_est = next(
            (int((r["b"] or 0) / frac) for r in agg_rows if r["gid"] == gid_all), 0
        )
        budget = min(max(total_bytes_est // max(num, 1), 4 << 20), 1 << 30)
        skewed: list[tuple[tuple[str, ...], int]] = []
        for r in agg_rows:
            if r["gid"] != 0:
                continue
            est_rows = int(r["n"] / frac)
            est_bytes = int((r["b"] or 0) / frac)
            salt_n = max(-(-est_rows // target_rows), -(-est_bytes // budget))
            if salt_n > 1:
                skewed.append(
                    (
                        tuple("\x00<NULL>" if r[k] is None else str(r[k]) for k in keys),
                        salt_n,
                    )
                )
        if skewed:
            # NULL-safe key text on BOTH sides: concat_ws silently drops
            # NULL columns, so a skewed NULL-keyed group would build a
            # "None" mapping entry the JVM lookup never produces (and a
            # key literally named "None" would collide with it) — use an
            # explicit NULL token via coalesce instead (round-6 review)
            mapping = F.create_map(
                *[
                    x
                    for key_strs, sn in skewed
                    for x in (F.lit("\x1f".join(key_strs)), F.lit(sn))
                ]
            )
            salt_n_col = F.coalesce(
                mapping[
                    F.concat_ws(
                        "\x1f",
                        *[
                            F.coalesce(F.col(k).cast("string"), F.lit("\x00<NULL>"))
                            for k in keys
                        ],
                    )
                ],
                F.lit(1),
            )
            others = [c for c in df.columns if c not in keys]
            salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in others] or [F.lit(0)]), salt_n_col)
    return df.repartition(num, *key_cols, salt_col)


def encode_pipeline(
    df: DataFrame,
    codec: str = "auto",
    keys: tuple[str, ...] = ("lang", "repo"),
    num_partitions: int | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    salt: bool = True,
    presample: bool = True,
    codec_hints: dict[str, str] | None = None,
) -> DataFrame:
    """repartition-by-(lang, repo, salt) → encode: the flagship path.

    ``presample`` runs the codec selector once driver-side and seeds
    every task with the result (see :func:`presample_codecs`); pass
    ``codec_hints`` directly to reuse hints across multiple runs over
    the same data (the hints are a driver-side constant — compute once,
    encode for hours)."""
    hints = codec_hints if codec_hints is not None else (
        presample_codecs(df) if presample and codec == "auto" else None
    )
    return encode_dataframe(
        partition_for_encoding(df, keys=keys, num_partitions=num_partitions, salt=salt, target_rows=max(chunk_rows * 4, 1 << 18)),
        codec=codec,
        chunk_rows=chunk_rows,
        codec_hints=hints,
    )


def size_report(chunks: DataFrame) -> DataFrame:
    """Per-(column, codec) compression summary of a chunk table."""
    return (
        chunks.groupBy("column", "codec")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("num_rows").alias("rows"),
            F.sum("plain_bytes").alias("plain_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
        )
        .withColumn(
            "ratio",
            F.round(F.col("plain_bytes") / F.greatest(F.col("encoded_bytes"), F.lit(1)), 3),
        )
        .orderBy("column", "codec")
    )
