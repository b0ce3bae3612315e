"""Driver-contract shape tests for __spark_entry__."""

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries().keys())
    o = set(entrymod.oracle_sql().keys())
    assert o <= q, f"oracle entries without queries: {o - q}"
    # the non-oracled ones are the genuinely non-SQL-expressible ops
    # (engine metadata, xxhash64-based fingerprints, media stubs)
    assert q - o <= {
        "codec_selection",
        "winnow_fingerprints",
        "multimodal_features",
    }


def test_entry_runs_and_reports(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5  # one per input column
    cols = {r["column"] for r in rows}
    assert cols == {"repo", "path", "commit", "lang", "content"}
    assert all(r["encoded_bytes"] > 0 for r in rows)
    total_enc = sum(r["encoded_bytes"] for r in rows)
    total_plain = sum(r["plain_bytes"] for r in rows)
    assert total_enc < total_plain  # north rule: size <= reference PLAIN


def test_all_queries_return_rows(spark, sf_small):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_small)
        n = df.count()
        assert n >= 0, name
        assert len(df.columns) >= 2, name
