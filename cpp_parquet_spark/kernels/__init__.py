"""Pure numpy/pyarrow codec kernels (no Spark imports).

These are the vectorized reimplementation of the reference's encoder
operators O8-O11 (SURVEY.md §2) plus the north-rule codecs.
"""

from cpp_parquet_spark.kernels.bitpack import (
    pack_bits,
    unpack_bits,
    encode_vlq,
    decode_vlq,
)
from cpp_parquet_spark.kernels.rle import encode_hybrid, decode_hybrid

__all__ = [
    "pack_bits",
    "unpack_bits",
    "encode_vlq",
    "decode_vlq",
    "encode_hybrid",
    "decode_hybrid",
]
