#!/usr/bin/env python3
"""Differential fuzz band for the span/retrieval operator family
(VERDICT r9 #5): random (n, minCount, k, k1, b, mod, nTerms) over
seeded small-alphabet corpora with planted cross-doc span copies.
The Spark side runs the real OPERATORS via `graft.FuzzOps`; the
oracle side runs the parameterized SQL the shared Scala builders
emit (same builders the q102-q107/q103 oracles use).

Usage: python3 tools/fuzz_span_retrieval.py [n_cases] [seed]
"""
import json, math, random, subprocess, sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 42
OUT = "/tmp/fuzz_ops_out"
PARAMS = "/tmp/fuzz_ops_params.txt"


def gen_cases(rnd):
    lines = [
        # one corpus per seed: 120-300 docs, alphabet 6-24 tokens,
        # len 5-120, 20-50% of docs copy a span from an earlier doc
        f"corpus,{rnd.randrange(1 << 30)},{rnd.randint(120, 300)},"
        f"{rnd.randint(6, 24)},5,{rnd.randint(40, 120)},{rnd.randint(20, 50)}"
    ]
    for i in range(N):
        op = rnd.choice(["excise", "decont", "derep", "novelty", "bm25",
                         "html", "links"])
        n = rnd.randint(2, 8)
        if op == "excise":
            lines.append(f"c{i:03d},excise,{n},{rnd.choice([2, 2, 3, 4])}")
        elif op == "decont":
            lines.append(f"c{i:03d},decont,{n}")
        elif op == "derep":
            lines.append(f"c{i:03d},derep,{n}")
        elif op == "novelty":
            lines.append(f"c{i:03d},novelty,{n}")
        elif op == "html":
            # random extraction gates: min text chars and density pct
            lines.append(f"c{i:03d},html,{rnd.randint(2, 25)},"
                         f"{rnd.randint(10, 95)}")
        elif op == "links":
            lines.append(f"c{i:03d},links")
        else:
            k = rnd.randint(1, 10)
            k1 = rnd.choice([0.8, 1.0, 1.2, 1.5, 2.0])
            b = rnd.choice([0.0, 0.25, 0.5, 0.75, 1.0])
            mod = rnd.choice([23, 41, 97])
            nt = rnd.randint(1, 6)
            lines.append(f"c{i:03d},bm25,{k},{k1},{b},{mod},{nt}")
    return lines


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(v) for v in t))
    return sorted(cols), out


def cell_eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    return str(a) == str(b)


def main():
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    rnd = random.Random(SEED)
    lines = gen_cases(rnd)
    with open(PARAMS, "w") as f:
        f.write("\n".join(lines) + "\n")
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.FuzzOps {PARAMS} {OUT}"],
        cwd="/root/repo", check=True, capture_output=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{OUT}/corpus/*.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        case = next(l for l in lines if l.startswith(name + ","))
        try:
            o = con.sql(sql)
            ocols, orows = canon(o.fetchall(), [d[0] for d in o.description])
            s = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            scols, srows = canon(s.fetchall(), [d[0] for d in s.description])
        except Exception as e:
            print(f"FAIL {name}: harness error {e}\n  case: {case}")
            n_fail += 1
            continue
        ok = (ocols == scols and len(orows) == len(srows) and
              all(len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
                  for a, b in zip(orows, srows)))
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name} ({len(orows)} oracle vs {len(srows)} spark rows)")
            print(f"  case: {case}")
    print(f"== span/retrieval fuzz: {n_pass} pass, {n_fail} fail "
          f"(seed={SEED}, n={N}) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
