"""Text analysis operators: token counting, language id, quality
scoring, fingerprinting.

All expressions are JVM-side (``pyspark.sql.functions``) so Catalyst
can pipeline them into the scan; each has an exact ANSI-SQL equivalent
used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word-ish tokens; same RE2/Java semantics in Spark and DuckDB
TOKEN_RE = "[A-Za-z0-9_]+"

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "it")


def token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword/word-length quality features per document."""
    c = F.col(text_col)
    toks = F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(c).cast("long")
    alnum = F.length(F.regexp_replace(c, "[^A-Za-z0-9]", ""))
    stop_hits = F.size(
        F.filter(
            F.transform(toks, lambda t: F.lower(t)),
            lambda t: t.isin(*_STOPWORDS),
        )
    ).cast("long")
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        F.round(alnum / F.greatest(n_chars, F.lit(1)), 4).alias("q_alnum_ratio"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4).alias("q_avg_token_len"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 4).alias("q_stopword_ratio"),
    )


def lang_guess(col: Column) -> Column:
    """Keyword-heuristic language id for source text (n-gram rules)."""
    c = col
    return (
        F.when(c.rlike(r"#include\s*<"), "cpp")
        .when(c.rlike(r"\bpackage main\b") | c.rlike(r"\bfunc \w+\("), "go")
        .when(c.rlike(r"\bfn \w+\(") | c.rlike(r"\blet mut\b"), "rust")
        .when(c.rlike(r"\bpublic (class|static)\b"), "java")
        .when(c.rlike(r"\bdef \w+\(") | c.rlike(r"\bimport \w+\s"), "python")
        .when(c.rlike(r"\bfunction\b") | c.rlike(r"\bconst \w+ ="), "javascript")
        .when(c.rlike(r"^#!/bin/(ba)?sh"), "shell")
        .otherwise("unknown")
    )


def doc_fingerprint(col: Column) -> Column:
    """Whitespace-normalized md5 fingerprint (md5 exists in both Spark
    and DuckDB, so this is oracle-checkable; the rolling-hash winnowing
    variant lives in dedup.winnow_fingerprints)."""
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", " ")))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_computed"),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
        lang_guess(F.col(text_col)).alias("lang_guess"),
    )
