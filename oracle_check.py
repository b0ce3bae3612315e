#!/usr/bin/env python3
"""Round-6 validation tool: run declared queries against their DuckDB
oracles (the driver's compare: sorted rows over name-sorted columns,
value-identical) at a given SF dir.  Not part of the bench; used to
prove result-identity after each optimization.

Usage: python oracle_check.py /root/testdata/sf0.001 [q1,q2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench


def _duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main() -> None:
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = bench.make_session(bench.CPUS)
    con = _duckdb_con(sf_dir)
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = sorted(df.columns)
            srows = sorted((tuple(r[c] for c in scols) for r in df.collect()), key=repr)
            rel = con.sql(oracles[name])
            idx = [rel.columns.index(c) for c in sorted(rel.columns)]
            orows = sorted((tuple(r[i] for i in idx) for r in rel.fetchall()), key=repr)
            ok = sorted(rel.columns) == scols and srows == orows
            if not ok:
                diff = next(((a, b) for a, b in zip(srows, orows) if a != b), ("len", (len(srows), len(orows))))
                print(f"FAIL {name}: {diff}", flush=True)
                failed.append(name)
            else:
                print(f"ok   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
            failed.append(name)
    bench.hard_stop(spark)
    print("FAILED:" if failed else "ALL OK", failed, flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
