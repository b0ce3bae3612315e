"""cpp_parquet_spark — a from-scratch PySpark-native columnar
lightweight-compression engine.

Reimplements (does NOT port) the encoding path of nealsid/cpp-parquet
(/root/reference): Dremel definition/repetition levels encoded with the
Parquet RLE/bit-packed hybrid (reference grammar:
parquet-file/util/rle-encoding.h:36-75), PLAIN value layout
(parquet-file/parquet-column.cc:238-258, 383-455), plus the lightweight
codecs the north rule adds: dictionary+RLE indices, plain value RLE,
FSST-style symbol-table string compression, frame-of-reference +
bit-packing, and a statistics-driven codec auto-selector.

Architecture is Spark-first: the engine is a library of DataFrame
transformations plus vectorized Arrow (`mapInArrow`) kernels — no
per-row Python anywhere, no custom Catalyst rules needed.
"""

__version__ = "0.1.0"
