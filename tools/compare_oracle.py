#!/usr/bin/env python3
"""Local rehearsal of the driver's DuckDB-oracle compare (SURVEY §5.2.1).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - run the oracle SQL in DuckDB with views bound over <sfDir>/*.parquet
  - read the Spark result parquet from <verifyOutDir>/<name>/
  - sort columns by name, compare row-by-row after canonicalization
Exit nonzero if any query mismatches.
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    # Decimal -> normalized string; datetime -> isoformat; else str
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return str(v.normalize()) if v != 0 else "0"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rel.fetchall():
        out.append(tuple(canon(row[i]) for i in order))
    return [cols[i] for i in order], out


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
            ocols, orows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no spark result parquet"))
            continue
        scols, srows = rows_of(con.sql(
            f"SELECT * FROM read_parquet({files!r})"))
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
    # queries with results but no oracle entry -> rows-only check
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
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
