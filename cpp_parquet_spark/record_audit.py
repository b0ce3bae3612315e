"""Per-record byte accounting (reference O17).

Reimplements ParquetFile::BytesForRecord / ParquetColumn::recordSize
(parquet-file.cc:92-102, parquet-column.h:133-138): the raw PLAIN byte
cost of each record = Σ over leaf columns of the record's datum bytes
(fixed width per datum; 4-byte length prefix + bytes for BYTE_ARRAY;
nulls cost 0).  The reference's golden tests assert exactly these
per-record numbers; ours do too (tests/test_record_audit.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cpp_parquet_spark.kernels.levels import shred
from cpp_parquet_spark.schema_plan import ColumnPlan, plan_from_schema

_WIDTH = {"INT32": 4, "INT64": 8, "FLOAT": 4, "DOUBLE": 8, "BOOLEAN": 1}


def record_sizes(table: pa.Table | pa.RecordBatch) -> np.ndarray:
    """PLAIN byte size of every record across all leaf columns."""
    plans = plan_from_schema(table.schema)
    n = table.num_rows
    out = np.zeros(n, dtype=np.int64)
    for plan in plans:
        col = table.column(plan.path[0])
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        out += _column_record_sizes(arr, plan, n)
    return out


def _column_record_sizes(arr: pa.Array, plan: ColumnPlan, n: int) -> np.ndarray:
    sh = shred(arr, plan)
    # datums per record: entries with def == max_def, grouped by record
    # (rep == 0 starts a record)
    if sh.rep_levels is not None:
        rec_id = np.cumsum(sh.rep_levels == 0) - 1
    else:
        rec_id = np.arange(sh.num_entries, dtype=np.int64)
    present = (
        sh.def_levels == plan.max_def
        if sh.def_levels is not None
        else np.ones(sh.num_entries, dtype=bool)
    )
    sizes = np.zeros(n, dtype=np.int64)
    if plan.physical == "BYTE_ARRAY":
        import pyarrow.compute as pc

        lens = np.zeros(sh.num_entries, dtype=np.int64)
        if len(sh.values):
            vlens = np.asarray(pc.binary_length(sh.values), dtype=np.int64)
            lens[present] = vlens + 4  # u32 prefix per datum
        np.add.at(sizes, rec_id, lens)
    else:
        w = _WIDTH[plan.physical]
        np.add.at(sizes, rec_id, present.astype(np.int64) * w)
    return sizes
