#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the sfDir parquet tables, load the Spark parquet result, sort
columns by name, sort rows, round floats, and compare.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple(str(v) for v in t))
    return [c for c in sorted(cols)], out


def cell_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return str(a) == str(b)


def rows_eq(orows, srows):
    if len(orows) != len(srows):
        return False
    return all(len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
               for a, b in zip(orows, srows))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.sql(sql)
            ocols, orows = canon(o.fetchall(), [d[0] for d in o.description])
            s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = canon(s.fetchall(), [d[0] for d in s.description])
        except Exception as e:
            print(f"FAIL {name}: harness error {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: schema oracle={ocols} spark={scols}")
            n_fail += 1
        elif not rows_eq(orows, srows):
            diff = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)} first_diffs={diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
