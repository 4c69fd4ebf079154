#!/usr/bin/env python3
"""Driver-faithful rehearsal of the DuckDB-oracle compare (SURVEY §5.2.1).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Emulates the driver's pipeline (root-caused in VERDICT r01):
  - oracle side: DuckDB `.df()` -> pandas, where HUGEINT (SUM of BIGINT) and
    DECIMAL arrive as float64 and DATE as datetime64;
  - spark side: pandas.read_parquet on the Verify output, where BIGINT stays
    int64, DECIMAL stays decimal.Decimal objects, DATE stays datetime.date;
  - columns sorted by name, rows sorted by all columns with pandas
    sort_values — which CRASHES on array/ndarray cells exactly like the
    driver (r01 q02/q69);
  - cell values compared on their type-bearing string forms, so
    10649 (int64) != 10649.0 (float64) and Decimal('255262.00') != 255262.0
    — the r01 hash-fail classes — fail locally too. The ONLY cross-type
    leniency kept is date-vs-midnight-timestamp, which the driver's r01
    results show passing (q06/q27/q57).

Exit nonzero if any query mismatches.
"""
import glob
import json
import math
import os
import sys
import datetime
import decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class ComparatorCrash(Exception):
    """Mirror of the driver's pandas sort_values TypeError on array cells."""


def canon(v):
    """Type-bearing canonical string: int64 vs float64 vs Decimal DIFFER."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.ndarray, list)):
        raise ComparatorCrash(
            "array-typed cell would crash the driver comparator (pandas "
            "sort_values -> unhashable type: numpy.ndarray)")
    if isinstance(v, (float, np.floating)):
        return "NULL" if math.isnan(v) else repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return "Decimal:" + str(v)  # NO normalize(): trailing zeros count
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return "NULL"
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()  # DATE arrives as midnight Timestamp
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if pd.isna(v):
        return "NULL"
    return str(v)


def frame_rows(df):
    """Driver shape: columns sorted by name, rows sorted by all columns."""
    cols = sorted(df.columns, key=str.lower)
    df = df[cols]
    # sort_values over every column — object columns with ndarray cells
    # throw here, exactly like the driver
    try:
        df = df.sort_values(by=cols, kind="mergesort", na_position="last")
    except TypeError as e:
        raise ComparatorCrash(f"pandas sort_values crash: {e}")
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        try:
            ocols, orows = frame_rows(con.sql(oracle[name]).df())
        except ComparatorCrash as e:
            failures.append((name, f"oracle side: {e}"))
            continue
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failures.append((name, "no spark result parquet"))
            continue
        try:
            scols, srows = frame_rows(
                pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        except ComparatorCrash as e:
            failures.append((name, f"spark side: {e}"))
            continue
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            failures.append((name, f"column mismatch: oracle={ocols} spark={scols}"))
            continue
        if len(orows) != len(srows):
            failures.append((name, f"row count: oracle={len(orows)} spark={len(srows)}"))
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
        if bad:
            i, a, b = bad[0]
            failures.append((name, f"{len(bad)} differing rows; first at {i}:\n  oracle={a}\n  spark ={b}"))
        else:
            print(f"  OK {name}: {len(orows)} rows")
    # queries with results but no oracle entry -> rows-only check (the array
    # crash still applies: the driver sorts before counting)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            try:
                _, rows = frame_rows(pd.concat(
                    [pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                    ignore_index=True))
                n = len(rows)
            except ComparatorCrash as e:
                failures.append((name, f"rows-only: {e}"))
                continue
            print(f"  rows-only {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            if n == 0:
                failures.append((name, "rows-only query returned 0 rows"))
    if failures:
        print(f"\nFAILURES ({len(failures)}):")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
