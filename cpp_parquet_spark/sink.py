"""Distributed Parquet sink: every Spark task writes a real .parquet part
file with :class:`cpp_parquet_spark.parquet_writer.ParquetWriter`.

This is the reference's single-process writer lifecycle
(parquet-file.cc:118-177) lifted to Spark's execution model: N tasks
write N independent files under one directory, each streaming row
groups as Arrow batches arrive, so executor memory is bounded by the
row-group size regardless of partition size.  ``spark.read.parquet``
(or DuckDB/pyarrow on the directory) is the independent-reader oracle,
mirroring the reference's parquet-dump validation
(parquet-file-test.cc:37-50).

Scale notes: the directory must be shared storage on a real cluster
(HDFS/S3/NFS — local tmpfs here); files are written to a temp name and
renamed on close so task retries never leave a readable partial file.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterable, Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from cpp_parquet_spark.engine import DEFAULT_CHUNK_ROWS
from cpp_parquet_spark.parquet_writer import ParquetWriter

MANIFEST_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("part_id", IntegerType(), False),
        StructField("rows", LongType(), False),
        StructField("row_groups", LongType(), False),
        StructField("bytes", LongType(), False),
    ]
)

_MANIFEST_ARROW = pa.schema(
    [
        ("file", pa.string()),
        ("part_id", pa.int32()),
        ("rows", pa.int64()),
        ("row_groups", pa.int64()),
        ("bytes", pa.int64()),
    ]
)


def write_dataset(
    df: DataFrame,
    directory: str,
    row_group_rows: int = DEFAULT_CHUNK_ROWS,
    row_group_bytes: int | None = None,
    compression: str | None = None,
    use_dictionary: bool = True,
    data_page_version: int = 1,
) -> DataFrame:
    """Write ``df`` as a directory of real Parquet part files.

    Returns the manifest DataFrame (one row per written file).  The
    write happens when the manifest is consumed — collect it (or count
    it) to force the job, then point any Parquet reader at
    ``directory``.
    """
    os.makedirs(directory, exist_ok=True)

    def task(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        final = os.path.join(directory, f"part-{pid:05d}.parquet")
        tmp = final + f".{uuid.uuid4().hex[:8]}.inprogress"
        writer: ParquetWriter | None = None
        buf: list[pa.RecordBatch] = []
        buf_rows = 0

        buf_bytes = 0

        def flush() -> None:
            nonlocal writer, buf, buf_rows, buf_bytes
            tbl = pa.Table.from_batches(buf)
            if writer is None:
                writer = ParquetWriter(
                    tmp,
                    tbl.schema,
                    compression=compression,
                    use_dictionary=use_dictionary,
                    data_page_version=data_page_version,
                )
            writer.write_row_group(tbl)
            buf, buf_rows, buf_bytes = [], 0, 0

        for b in batches:
            if b.num_rows == 0:
                continue
            buf.append(b)
            buf_rows += b.num_rows
            buf_bytes += b.nbytes
            # greedy packing: flush at the row ceiling, or — with a byte
            # target set (the reference's kMaxDataBytesPerRowGroup,
            # parquet-file.cc:104-116) — when data bytes reach it
            if buf_rows >= row_group_rows or (
                row_group_bytes is not None and buf_bytes >= row_group_bytes
            ):
                flush()
        if buf_rows:
            flush()
        if writer is None:
            return  # empty partition -> no file
        stats = writer.close()
        os.replace(tmp, final)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([final], pa.string()),
                pa.array([pid], pa.int32()),
                pa.array([stats["rows"]], pa.int64()),
                pa.array([stats["row_groups"]], pa.int64()),
                pa.array([os.path.getsize(final)], pa.int64()),
            ],
            schema=_MANIFEST_ARROW,
        )

    return df.mapInArrow(task, MANIFEST_SCHEMA)


def write_parquet_dir(
    df: DataFrame,
    directory: str,
    row_group_rows: int = DEFAULT_CHUNK_ROWS,
    row_group_bytes: int | None = None,
    compression: str | None = None,
    use_dictionary: bool = True,
    data_page_version: int = 1,
) -> list:
    """Force the write; return the manifest rows (driver-side metadata,
    one row per file — safe to collect)."""
    return write_dataset(
        df,
        directory,
        row_group_rows=row_group_rows,
        row_group_bytes=row_group_bytes,
        compression=compression,
        use_dictionary=use_dictionary,
        data_page_version=data_page_version,
    ).collect()
