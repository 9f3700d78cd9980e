#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at sf0.01, compare row count, schema (column names), and an
order-insensitive value hash.

Usage: python scripts/check_entry.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def value_hash(df: pd.DataFrame) -> int:
    """Order-insensitive value hash, DTYPE-STRICT: the dtype *kind* of
    every column (int vs float vs bool vs object) is hashed alongside the
    values, so an oracle that returns float64 where Spark returns bigint
    fails here the same way it fails the driver (round-3 lesson:
    `language_id` passed a dtype-insensitive local replay but failed the
    driver's stricter hash on exactly that difference)."""
    df = df[sorted(df.columns)].copy()
    kinds = []
    for c in df.columns:
        col = df[c]
        kinds.append(col.dtype.kind)
        if col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            df[c] = col.round(6)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    return hash((tuple(kinds), tuple(rows)))


def main() -> None:
    import __spark_entry__ as entry

    from namedis_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-entry", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(sdf)} ({time.time() - t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} != {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}")
        if not problems and value_hash(sdf) != value_hash(ddf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time() - t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} ({time.time() - t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
