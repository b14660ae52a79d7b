#!/usr/bin/env python3
"""Strict local stand-in for the driver's DuckDB HASH gate.

Unlike compare_oracle.py (tolerant float compare), this canonicalizes
every cell to its exact string repr and compares — the way an exact
hash of canonicalized values would. A PASS here should imply
hash_match=true in the driver's CORRECTNESS_r{N}.json.

Usage: python3 tools/compare_oracle_strict.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    # floats round to 6 decimals before repr — r1 evidence says the
    # driver's hash canonicalization does the same (q16/q32 passed with
    # 1e-13-level diffs; q10 failed with a diff at the 6th decimal)
    if isinstance(v, float):
        return repr(round(v, 6))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
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
        elif orows != srows:
            diffs = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
            print(f"FAIL {name}: oracle={len(orows)} spark={len(srows)} "
                  f"first_diffs={diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== strict: {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
