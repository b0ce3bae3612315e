"""Statistics-driven codec auto-selector.

North-rule component (BASELINE.json north_star; cf. PAPERS.md:8,
"Adaptive Compression for Fast Scans on String Columns"): per column
chunk, sample cardinality / run structure / byte entropy via Arrow
compute + numpy, shortlist candidate codecs by rule, then encode a
deterministic sample with each shortlisted codec and keep the smallest.

The reference has no equivalent — its only "choice" is the RLE
encoder's internal repeated-vs-literal decision (rle-encoding.h:269-298);
this module lifts that adaptivity to whole-column granularity.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cpp_parquet_spark.kernels.plain import plain_size
from cpp_parquet_spark.kernels.rle_runs import run_count

_SAMPLE_ROWS = 2048


@dataclass
class ColumnStats:
    n: int
    cardinality: int
    runs: int
    avg_len: float  # BYTE_ARRAY only; 0 otherwise
    byte_entropy: float  # BYTE_ARRAY only (bits/byte on sample); 0 otherwise
    int_range_bits: int  # integer types only; width of (max-min)
    avg_newlines: float = 0.0  # BYTE_ARRAY only; newlines per value
    sorted_prefix: bool = False  # integers only; contiguous prefix monotone
    distinct_bytes: int = 256  # BYTE_ARRAY only; alphabet size on sample


def _sample(values: pa.Array) -> pa.Array:
    n = len(values)
    if n <= _SAMPLE_ROWS:
        return values
    step = n // _SAMPLE_ROWS
    idx = np.arange(0, step * _SAMPLE_ROWS, step, dtype=np.int64)
    return values.take(pa.array(idx))


def column_stats(values: pa.Array, physical: str) -> ColumnStats:
    n = len(values)
    if n == 0:
        return ColumnStats(0, 0, 0, 0.0, 0.0, 0)
    sample = _sample(values)
    card = pc.count_distinct(sample).as_py()
    # runs must be measured on a *contiguous* slice — a strided sample
    # destroys run structure
    runs = run_count(values.slice(0, min(n, _SAMPLE_ROWS)))
    avg_len = entropy = avg_nl = 0.0
    range_bits = 0
    distinct_bytes = 256
    if physical == "BYTE_ARRAY":
        lens = pc.binary_length(sample)
        avg_len = float(pc.mean(lens).as_py() or 0.0)
        bin_sample = sample.cast(pa.large_binary())
        buf = bin_sample.buffers()[2]
        if buf is not None and len(buf) > 0:
            raw = np.frombuffer(buf, dtype=np.uint8)[: 1 << 16]
            hist = np.bincount(raw, minlength=256).astype(np.float64)
            p = hist[hist > 0] / len(raw)
            entropy = float(-(p * np.log2(p)).sum())
            avg_nl = float(hist[10] / len(raw) * avg_len)
            distinct_bytes = int((hist > 0).sum())
        return ColumnStats(n, card, runs, avg_len, entropy, 0, avg_nl, False, distinct_bytes)
    sorted_prefix = False
    if physical in ("INT32", "INT64"):
        t = sample
        if pa.types.is_date(t.type):  # no direct date32->int64 cast in pyarrow 16
            t = t.cast(pa.int32()).cast(pa.int64())
        elif pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        mm = pc.min_max(t)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        range_bits = int(hi - lo).bit_length() if hi is not None else 0
        prefix = values.slice(0, min(n, _SAMPLE_ROWS))
        if pa.types.is_date(prefix.type):
            prefix = prefix.cast(pa.int32()).cast(pa.int64())
        elif pa.types.is_timestamp(prefix.type):
            prefix = prefix.cast(pa.int64())
        pv = np.asarray(prefix)
        sorted_prefix = bool(len(pv) > 2 and (np.diff(pv) >= 0).all())
    return ColumnStats(n, card, runs, avg_len, entropy, range_bits, avg_nl, sorted_prefix)


def shortlist(stats: ColumnStats, physical: str) -> list[str]:
    """Rule-based candidate codecs, cheapest-to-try first."""
    if stats.n == 0:
        return ["plain"]
    s = stats
    sample_n = min(s.n, _SAMPLE_ROWS)
    cands: list[str] = []
    runny = s.runs <= max(1, sample_n // 8)
    low_card = s.cardinality <= max(1, sample_n // 4)
    if physical == "BYTE_ARRAY":
        if runny:
            cands.append("rle")
        if low_card:
            cands.append("dict")
        # tiny alphabet (hex hashes): near-entropy bit packing at
        # memory speed; the full-chunk alphabet is re-checked at encode
        if s.distinct_bytes <= 16 and not low_card:
            cands.append("alpha")
        # multi-line text: line-dictionary is both the fastest and the
        # strongest codec when lines repeat (source code)
        if s.avg_newlines >= 2 and not low_card:
            cands.append("lined")
        # redundancy worth FSST: mid/low entropy, not already dict-able.
        # FSST is a *short-string* codec (paths, identifiers, code-ish
        # rows): its encode replays merge rounds over every token,
        # O(rounds × payload) with heavy constants — ~12 MB/s/core
        # clean-window measured in r5 (sentinel-aligned blocked replay,
        # perf-gated by test_fsst_encode_throughput_gate; the numpy op
        # floor on this box, ~0.3 G elem/s cumsum, rules out going much
        # higher).  So cap the estimated chunk payload — on a 154 MB
        # document chunk the r1 code crawled at ~1 MB/s (163 s) while
        # lined does >100 MB/s at a similar ratio (r2 fix).  Within the
        # cap the worst case is ~3 s per chunk, which the ratio win
        # pays for.
        payload_est = s.n * s.avg_len
        if 8 <= s.avg_len <= 4096 and payload_est <= 32e6 and not low_card and s.byte_entropy < 7.0:
            cands.append("fsst")
        cands.append("plain")
    elif physical in ("INT32", "INT64"):
        if runny:
            cands.append("rle")
        if low_card:
            cands.append("dict")
        if s.sorted_prefix:
            cands.append("delta")
        type_bits = 32 if physical == "INT32" else 64
        if s.int_range_bits < type_bits - 8:
            cands.append("for")
        cands.append("plain")
    elif physical == "BOOLEAN":
        if runny:
            cands.append("rle")
        cands.append("boolpack")  # 8x vs the byte-per-value baseline, always
        cands.append("plain")
    else:  # FLOAT/DOUBLE
        if runny:
            cands.append("rle")
        if low_card:
            cands.append("dict")
        cands.append("plain")
    return cands


def select_codec(values: pa.Array, physical: str, mode: str = "auto") -> str:
    """Pick the codec for one column chunk.

    mode='auto': rule shortlist, then trial-encode a sample and keep the
    smallest output (deterministic).  mode=<codec name>: forced.
    """
    if mode != "auto":
        return mode
    stats = column_stats(values, physical)
    cands = shortlist(stats, physical)
    if len(cands) == 1:
        return cands[0]
    from cpp_parquet_spark.chunk import _encode_values

    # Trial-encode contiguous runs so run-based codecs compete fairly,
    # but take TWO slices (head + middle): a chunk can be heterogeneous
    # (e.g. short synthetic rows followed by long documents) and a
    # head-only sample picks the wrong codec for the bulk of the bytes.
    # Cap the trial payload at ~2 MB so long-value columns don't make
    # selection itself expensive.
    n = len(values)
    n_trial = min(_SAMPLE_ROWS, max(256, int(2_000_000 / max(stats.avg_len, 1.0))))
    if n > 2 * n_trial:
        half = n_trial // 2
        sample = pa.concat_arrays([values.slice(0, half), values.slice(n // 2, half)])
    else:
        sample = values.slice(0, min(n, n_trial))
    base = plain_size(sample, physical)
    # expensive codecs must clear a margin over PLAIN; a ~5% win (e.g.
    # fsst's bit-packed lengths vs PLAIN's u32 prefixes on random data)
    # doesn't pay for encode/decode cost
    margin = {"fsst": 0.85, "lined": 0.9, "dict": 0.95, "rle": 0.95, "for": 0.98, "alpha": 0.95}
    best, best_size = "plain", base
    for c in cands:
        if c == "plain":
            continue
        if c == "fsst" and best_size < base * 0.55:
            continue  # a cheap codec already halved the data; skip the
            # expensive fsst trial — it rarely beats a 2x-winning lined/dict
        try:
            sz = len(_encode_values(sample, c, physical))
        except (ValueError, TypeError, pa.lib.ArrowNotImplementedError, pa.lib.ArrowInvalid):
            continue
        if sz < best_size and sz < base * margin.get(c, 1.0):
            best, best_size = c, sz
    return best
