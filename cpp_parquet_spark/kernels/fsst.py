"""FSST-style symbol-table string compression — fully vectorized.

North-rule codec for ``path``/``content`` payloads, after "FSST: Fast
Random Access String Compression" (PAPERS.md:9, VLDB 2020): a table of
at most 255 symbols of 1-8 bytes each, one output code per symbol, and
an escape code (255) for bytes outside the table, giving random-access
per-string decompression.

The classic FSST encoder is a sequential longest-match loop — hostile
to numpy.  This implementation reaches the same format family through
round-based pair merging (Re-Pair/BPE style): training picks the K most
frequent adjacent token pairs per round (bounded to 8-byte symbols),
and encoding replays the same merge rounds over the whole chunk with
vectorized simultaneous replacement.  Overlapping matches are resolved
exactly as a greedy left-to-right scan would by a parity rule inside
maximal runs of consecutive matches (valid[i] = match[i] & ~valid[i-1]
collapses to "even offset within run").

Everything — training, encoding, decoding — is numpy array passes; no
per-string or per-byte Python.  Strings never share symbols across
boundaries (a -1 sentinel token separates them).

Chunk layout:
  u8 n_codes | u8 sym_len[n_codes] | symbol blob |
  u32 stream_len | code stream (escape = 0xFF + raw byte) |
  u32 n_strings | u32 forblob_len | FOR blob of per-string stream bytes
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cpp_parquet_spark.kernels.forpack import decode_for, encode_for
from cpp_parquet_spark.kernels.plain import _byte_components

_ESCAPE = 255
_MAX_CODES = 255
_MAX_MERGED = 224  # leave >= 31 codes for frequent single bytes
_MAX_SYMBOL_LEN = 8
_ROUNDS = 10
_PAIRS_PER_ROUND = 32
_SAMPLE_TOKENS = 1 << 17
_KEY_BASE = 512  # tokens are < 512 (256 base + <=255 merged)


def _tokens_from_values(values: pa.Array) -> tuple[np.ndarray, int]:
    """Byte tokens with -1 sentinels between strings; returns (toks, n)."""
    lengths, payload = _byte_components(values)
    n = len(lengths)
    data_len = int(lengths.sum())
    total = data_len + max(n - 1, 0)
    toks = np.full(total, -1, dtype=np.int16)
    if data_len:
        cum = np.cumsum(lengths) - lengths
        starts = cum + np.arange(n, dtype=np.int64)  # +1 sentinel per earlier string
        tgt = np.repeat(starts, lengths) + (
            np.arange(data_len, dtype=np.int64) - np.repeat(cum, lengths)
        )
        toks[tgt] = payload.astype(np.int16)
    return toks, n


def _replace_pairs(toks: np.ndarray, keys_sorted: np.ndarray, new_ids: np.ndarray) -> np.ndarray:
    """Simultaneously replace every greedy-left-to-right occurrence of the
    given pairs (keys = left*_KEY_BASE + right) with their new token."""
    if len(toks) < 2 or len(keys_sorted) == 0:
        return toks
    left = toks[:-1].astype(np.int32)
    right = toks[1:].astype(np.int32)
    pairkey = left * _KEY_BASE + right
    pos = np.searchsorted(keys_sorted, pairkey)
    pos_c = np.minimum(pos, len(keys_sorted) - 1)
    match = (keys_sorted[pos_c] == pairkey) & (left >= 0) & (right >= 0)
    if not match.any():
        return toks
    # greedy overlap resolution: within each maximal run of consecutive
    # matches, only even offsets are applied
    idx = np.arange(len(match), dtype=np.int64)
    run_start = match & ~np.concatenate(([False], match[:-1]))
    last_start = np.maximum.accumulate(np.where(run_start, idx, -1))
    valid = match & (((idx - last_start) & 1) == 0)
    out = toks.copy()
    vpos = np.flatnonzero(valid)
    out[vpos] = new_ids[pos_c[vpos]].astype(np.int16)
    keep = np.ones(len(toks), dtype=bool)
    keep[vpos + 1] = False
    return out[keep]


def _train(sample: np.ndarray) -> tuple[list[tuple[np.ndarray, np.ndarray]], list[bytes]]:
    """Learn merge rounds on a token sample.

    Returns (rounds, symbols) where symbols[i] is the byte expansion of
    token 256+i and each round is (sorted pair keys, new token ids).
    """
    sym_bytes: list[bytes] = [bytes([i]) for i in range(256)]
    sym_len = np.ones(_KEY_BASE, dtype=np.int32)
    rounds: list[tuple[np.ndarray, np.ndarray]] = []
    toks = sample
    n_merged = 0
    min_count = max(4, len(sample) // 16384)
    for _ in range(_ROUNDS):
        if n_merged >= _MAX_MERGED or len(toks) < 2:
            break
        left = toks[:-1].astype(np.int32)
        right = toks[1:].astype(np.int32)
        ok = (left >= 0) & (right >= 0)
        keys = left[ok] * _KEY_BASE + right[ok]
        uniq, counts = np.unique(keys, return_counts=True)
        fits = (sym_len[uniq // _KEY_BASE] + sym_len[uniq % _KEY_BASE]) <= _MAX_SYMBOL_LEN
        uniq, counts = uniq[fits], counts[fits]
        good = counts >= min_count
        uniq, counts = uniq[good], counts[good]
        if len(uniq) == 0:
            break
        take = np.argsort(-counts, kind="stable")[: min(_PAIRS_PER_ROUND, _MAX_MERGED - n_merged)]
        chosen = np.sort(uniq[take])
        ids = np.arange(len(chosen), dtype=np.int32) + 256 + n_merged
        for k, tid in zip(chosen.tolist(), ids.tolist()):
            sym = sym_bytes[k // _KEY_BASE] + sym_bytes[k % _KEY_BASE]
            sym_bytes.append(sym)
            sym_len[tid] = len(sym)
        rounds.append((chosen, ids))
        toks = _replace_pairs(toks, chosen, ids)
        n_merged += len(chosen)
    return rounds, sym_bytes[256:]


def encode_fsst(values: pa.Array) -> bytes:
    toks, n = _tokens_from_values(values)
    rounds, merged_syms = _train(toks[:_SAMPLE_TOKENS])
    for keys, ids in rounds:
        toks = _replace_pairs(toks, keys, ids)

    n_merged = len(merged_syms)
    # assign codes: merged symbols first, then the most frequent remaining
    # base bytes; everything else escapes
    base_hist = np.bincount(toks[(toks >= 0) & (toks < 256)], minlength=256)
    n_single = min(_MAX_CODES - n_merged, int((base_hist > 0).sum()))
    singles = np.argsort(-base_hist, kind="stable")[:n_single]
    singles = singles[base_hist[singles] > 0]
    tok2code = np.full(_KEY_BASE, _ESCAPE, dtype=np.uint8)
    tok2code[256 : 256 + n_merged] = np.arange(n_merged, dtype=np.uint8)
    tok2code[singles] = np.arange(n_merged, n_merged + len(singles), dtype=np.uint8)
    table: list[bytes] = list(merged_syms) + [bytes([int(b)]) for b in singles]

    live = toks >= 0
    tok_live = toks[live].astype(np.int32)
    code = tok2code[tok_live]
    esc = code == _ESCAPE
    out_len = 1 + esc.astype(np.int64)
    pos = np.cumsum(out_len) - out_len
    stream = np.empty(int(out_len.sum()), dtype=np.uint8)
    stream[pos] = code
    if esc.any():
        stream[pos[esc] + 1] = tok_live[esc].astype(np.uint8)

    # per-string stream-byte lengths (sentinels emit nothing)
    sid = np.cumsum(toks == -1)[live]
    str_lens = np.bincount(sid, weights=out_len, minlength=max(n, 1)).astype(np.int64)[:n] if n else np.zeros(0, np.int64)

    out = bytearray()
    out.append(len(table))
    out += np.array([len(s) for s in table], dtype=np.uint8).tobytes()
    out += b"".join(table)
    out += len(stream).to_bytes(4, "little")
    out += stream.tobytes()
    out += n.to_bytes(4, "little")
    len_blob = encode_for(str_lens) if n else b""
    out += len(len_blob).to_bytes(4, "little")
    out += len_blob
    return bytes(out)


def decode_fsst(buf: bytes, n: int, arrow_type: pa.DataType) -> pa.Array:
    mv = memoryview(buf)
    n_codes = mv[0]
    lens = np.frombuffer(mv[1 : 1 + n_codes], dtype=np.uint8).astype(np.int64)
    pos = 1 + n_codes
    blob_len = int(lens.sum())
    blob = np.frombuffer(mv[pos : pos + blob_len], dtype=np.uint8)
    pos += blob_len
    stream_len = int.from_bytes(mv[pos : pos + 4], "little")
    pos += 4
    stream = np.frombuffer(mv[pos : pos + stream_len], dtype=np.uint8)
    pos += stream_len
    n_strings = int.from_bytes(mv[pos : pos + 4], "little")
    pos += 4
    fl = int.from_bytes(mv[pos : pos + 4], "little")
    pos += 4
    str_lens = decode_for(bytes(mv[pos : pos + fl]), n_strings) if n_strings else np.zeros(0, np.int64)
    assert n_strings == n, f"fsst chunk has {n_strings} strings, expected {n}"

    m = len(stream)
    if m:
        is_esc_byte = stream == _ESCAPE
        idx = np.arange(m, dtype=np.int64)
        run_start = is_esc_byte & ~np.concatenate(([False], is_esc_byte[:-1]))
        last_start = np.maximum.accumulate(np.where(run_start, idx, -1))
        marker = is_esc_byte & (((idx - last_start) & 1) == 0)
        payload = np.concatenate(([False], marker[:-1]))
        tok_pos = np.flatnonzero(~payload)
    else:
        marker = np.zeros(0, dtype=bool)
        tok_pos = np.zeros(0, dtype=np.int64)

    codes = stream[tok_pos]
    is_esc = marker[tok_pos]
    safe = np.where(is_esc, 0, codes).astype(np.int64)
    sym_start = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    out_len = np.where(is_esc, 1, lens[safe] if n_codes else 1)
    start = np.where(is_esc, blob_len + tok_pos + 1, sym_start[safe] if n_codes else 0)
    virtual = np.concatenate((blob, stream))
    total = int(out_len.sum())
    cum = np.cumsum(out_len) - out_len
    gat = np.repeat(start, out_len) + (np.arange(total, dtype=np.int64) - np.repeat(cum, out_len))
    out_bytes = virtual[gat] if total else np.zeros(0, np.uint8)

    # split by string: map token positions to string ids via stream offsets
    str_starts = np.cumsum(str_lens) - str_lens
    sid = np.searchsorted(str_starts, tok_pos, side="right") - 1 if m else np.zeros(0, np.int64)
    per_str = np.bincount(sid, weights=out_len, minlength=n).astype(np.int64) if len(sid) else np.zeros(n, np.int64)
    offsets = np.concatenate(([0], np.cumsum(per_str))).astype(np.int64)
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out_bytes.tobytes())],
    )
    return arr.cast(arrow_type)
