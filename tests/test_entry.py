"""Driver-contract shape tests for __spark_entry__."""

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries().keys())
    o = set(entrymod.oracle_sql().keys())
    assert o <= q, f"oracle entries without queries: {o - q}"
    # every query is oracled: winnow uses the md5-based hash twin and
    # multimodal_features the ASCII byte-class-count twin
    assert q == o, f"queries without oracle SQL: {q - o}"


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


def _duckdb_con(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _compare_with_oracle(spark, sf_dir, name):
    """Mimic the driver's compare: sorted rows over name-sorted columns
    must be value-identical between the Spark query and its DuckDB
    oracle SQL."""
    df = entrymod.queries()[name](spark, sf_dir)
    scols = sorted(df.columns)
    srows = sorted((tuple(r[c] for c in scols) for r in df.collect()), key=repr)
    con = _duckdb_con(sf_dir)  # keep alive: rel evaluates lazily
    rel = con.sql(entrymod.oracle_sql()[name])
    idx = [rel.columns.index(c) for c in sorted(rel.columns)]
    orows = sorted((tuple(r[i] for i in idx) for r in rel.fetchall()), key=repr)
    assert sorted(rel.columns) == scols, name
    assert srows == orows, f"{name}: first diff {next((a, b) for a, b in zip(srows, orows) if a != b)}"


def test_winnow_oracle_twin_exact(spark, sf_small):
    """The md5-hash60 winnowing twin is bit-identical in DuckDB —
    n/min/max/xor over the fingerprint set (round-5: last rows-only
    query oracled)."""
    _compare_with_oracle(spark, sf_small, "winnow_fingerprints")


def test_multimodal_features_oracle_twin_exact(spark, sf_small):
    """ASCII-guarded byte-histogram features reproduce exactly as
    DuckDB regex byte-class counts over the same IEEE division."""
    _compare_with_oracle(spark, sf_small, "multimodal_features")
