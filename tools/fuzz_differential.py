#!/usr/bin/env python3
"""Differential SQL fuzzer: generate seeded random queries from a
grammar both Spark SQL and DuckDB agree on, run both, compare.

Grammar (deliberately restricted to the common deterministic core):
  SELECT <group keys>, <aggs>
  FROM events|orders|lineitem [JOIN dim]
  [WHERE <pred>]
  [GROUP BY keys] [HAVING count(*) > h]
  ORDER BY all output columns

Usage: python3 tools/fuzz_differential.py [n_queries] [seed] [sfDir]
"""
import json, math, random, subprocess, sys

import duckdb

SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 42
OUT = "/tmp/fuzz_out"
TABLES = {
    "events": {
        "num": ["value", "user_id", "event_id"],
        "cat": ["event_type"],
        "all": ["event_id", "user_id", "event_type", "value"],
    },
    "orders": {
        "num": ["o_totalprice", "o_custkey", "o_orderkey"],
        "cat": ["o_orderstatus", "o_orderpriority"],
        "all": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    },
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_orderkey"],
        "cat": ["l_returnflag", "l_linestatus"],
        "all": ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
    },
}


def gen_join_query(rnd):
    # orders x customer equi-join with optional filters and aggregation
    fn = rnd.choice(["sum", "avg", "min", "max"])
    pred = (f" WHERE o_totalprice {rnd.choice(['<', '>='])} "
            f"{round(rnd.uniform(1000, 200000), 2)}") if rnd.random() < 0.6 else ""
    jt = rnd.choice(["JOIN", "LEFT JOIN"])
    if rnd.random() < 0.5:
        return (f"SELECT c_mktsegment, count(*) AS n, {fn}(o_totalprice) AS a0 "
                f"FROM orders {jt} customer ON o_custkey = c_custkey{pred} "
                f"GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS LAST")
    return (f"SELECT n_name, count(*) AS n, {fn}(c_acctbal) AS a0 "
            f"FROM customer {jt} nation ON c_nationkey = n_nationkey "
            f"GROUP BY n_name ORDER BY n_name NULLS LAST")


def gen_window_query(rnd):
    # NOTE (fuzzer finding): Spark SQL rejects frame refinement of a
    # named window (`OVER (w ROWS ...)`), which DuckDB accepts — framed
    # functions must inline the window spec; bare `OVER w` works in both.
    inline = "(PARTITION BY user_id ORDER BY ts, event_id"
    wfn = rnd.choice([
        "lag(value) OVER w", "lead(value) OVER w",
        "rank() OVER w", "row_number() OVER w",
        f"sum(value) OVER {inline} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        f"avg(value) OVER {inline} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
    ])
    pred = (f" WHERE value {rnd.choice(['<', '>='])} "
            f"{round(rnd.uniform(10, 150), 2)}") if rnd.random() < 0.5 else ""
    return (f"SELECT event_id, user_id, value, {wfn} AS w0 FROM events{pred} "
            f"WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            f"ORDER BY event_id")


def gen_rollup_query(rnd):
    t = rnd.choice(["lineitem", "events"])
    k = (["l_returnflag", "l_linestatus"] if t == "lineitem"
         else ["event_type", "user_id"])
    fn = rnd.choice(["sum", "avg", "min", "max"])
    c = rnd.choice(TABLES[t]["num"])
    if rnd.random() < 0.33:
        # explicit GROUPING SETS: random DISTINCT subset of the 4
        # possible sets (distinctness keeps every NULL pattern unique,
        # so NULLS-LAST ordering alone is deterministic — both keys
        # are non-null in the data)
        # the full set is always present so every selected key is
        # covered (both binders reject a selected key in no set)
        extra = rnd.sample([f"({k[0]})", f"({k[1]})", "()"],
                           rnd.randint(1, 3))
        sets = [f"({k[0]}, {k[1]})"] + extra
        g = f"GROUPING SETS ({', '.join(sets)})"
    else:
        g = f"{rnd.choice(['ROLLUP', 'CUBE'])} ({k[0]}, {k[1]})"
    return (f"SELECT {k[0]}, {k[1]}, count(*) AS n, {fn}({c}) AS a0 "
            f"FROM {t} GROUP BY {g} "
            f"ORDER BY {k[0]} NULLS LAST, {k[1]} NULLS LAST")


def gen_setop_query(rnd):
    op = rnd.choice(["INTERSECT", "EXCEPT", "UNION"])
    lo = rnd.randint(0, 50)
    hi = lo + rnd.randint(10, 120)
    return (f"SELECT user_id AS k FROM events WHERE value < {hi} "
            f"{op} SELECT user_id AS k FROM events WHERE value >= {lo} "
            f"ORDER BY k")


def gen_subquery_query(rnd):
    # correlated EXISTS / IN probes (the q5 semi/anti-join family)
    neg = rnd.choice(["", "NOT "])
    bal = round(rnd.uniform(-500, 5000), 2)
    if rnd.random() < 0.5:
        return (f"SELECT count(*) AS n FROM orders WHERE {neg}EXISTS "
                f"(SELECT 1 FROM customer WHERE c_custkey = o_custkey "
                f"AND c_acctbal > {bal})")
    lo = rnd.randint(0, 80)
    return (f"SELECT count(*) AS n FROM events WHERE user_id {neg}IN "
            f"(SELECT user_id FROM events WHERE value < {lo})")


def gen_percentile_query(rnd):
    # ANSI percentile_cont — the one ordered-set aggregate whose
    # syntax AND (n−1)·q interpolation both engines share
    t = rnd.choice(["events", "orders", "lineitem"])
    cols = TABLES[t]
    c = rnd.choice(cols["num"])
    k = rnd.choice(cols["cat"])
    q = rnd.choice([0.1, 0.25, 0.5, 0.75, 0.9])
    return (f"SELECT {k}, round(percentile_cont({q}) WITHIN GROUP "
            f"(ORDER BY {c}), 6) AS p, count(*) AS n "
            f"FROM {t} GROUP BY {k} ORDER BY {k} NULLS LAST")


def gen_text_query(rnd):
    # documents-table string functions from the dialect-shared core
    exprs = [
        "length(text)",
        "length(upper(text))",
        "length(substr(text, 1, %d))" % rnd.randint(1, 40),
        "length(replace(text, 'a', ''))",
        "length(trim(text))",
    ]
    e = rnd.choice(exprs)
    if rnd.random() < 0.5:
        return (f"SELECT lang, sum({e}) AS v, count(*) AS n "
                f"FROM documents GROUP BY lang ORDER BY lang")
    lo = rnd.randint(50, 400)
    return (f"SELECT doc_id, {e} AS v FROM documents "
            f"WHERE n_chars >= {lo} ORDER BY doc_id")


def gen_temporal_query(rnd):
    """Temporal band (round-9): the q74-q87 SHAPES — sessionization
    gaps, follow-up/as-of tolerance, attribution horizons, SCD run
    compaction — with random gap/horizon parameters, written in the
    dialect-shared core (interval literals + timestamp subtraction +
    named windows; NO epoch extraction, which the engines spell
    differently). All four verified hash-identical on the fixture
    before the band landed.
    """
    w = "(PARTITION BY user_id ORDER BY ts, event_id)"
    kind = rnd.randrange(6)
    if kind == 0:
        # sessionization with a random gap (the q58/q76 kernel)
        g = rnd.randint(3, 240)
        having = (f" HAVING count(*) > {rnd.randint(1, 3)}"
                  if rnd.random() < 0.4 else "")
        agg = rnd.choice(
            ["count(*) AS n, min(ts) AS start_ts, max(ts) AS end_ts",
             "count(*) AS n, round(sum(value), 6) AS v"])
        return (
            f"WITH m AS (SELECT user_id, ts, value, event_id, "
            f"CASE WHEN lag(ts) OVER w IS NULL "
            f"OR ts - lag(ts) OVER w > INTERVAL {g} MINUTE "
            f"THEN 1 ELSE 0 END AS brk FROM events WINDOW w AS {w}), "
            f"s AS (SELECT user_id, ts, value, sum(brk) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS UNBOUNDED PRECEDING) AS session FROM m) "
            f"SELECT user_id, session, {agg} FROM s "
            f"GROUP BY user_id, session{having} ORDER BY user_id, session")
    if kind == 1:
        # follow-up-within-horizon (the q47 tolerance shape)
        h = rnd.randint(5, 360)
        pred = (f" WHERE value {rnd.choice(['<', '>='])} "
                f"{round(rnd.uniform(10, 150), 2)}"
                if rnd.random() < 0.4 else "")
        return (
            f"SELECT event_type, count(*) AS n, "
            f"sum(CASE WHEN nxt IS NOT NULL AND nxt - ts <= "
            f"INTERVAL {h} MINUTE THEN 1 ELSE 0 END) AS fu "
            f"FROM (SELECT event_type, ts, lead(ts) OVER {w} AS nxt "
            f"FROM events{pred}) t GROUP BY event_type ORDER BY event_type")
    if kind == 2:
        # attribution horizon: value-based RANGE frame over event time
        # (round goes OUTSIDE the window call — DuckDB rejects
        # round(...) as the windowed function itself)
        h = rnd.randint(10, 600)
        frame = (f"OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN "
                 f"INTERVAL {h} MINUTE PRECEDING AND CURRENT ROW)")
        fn = rnd.choice([f"count(*) {frame}",
                         f"round(sum(value) {frame}, 6)"])
        return (f"SELECT event_id, user_id, {fn} AS nwin "
                f"FROM events ORDER BY event_id")
    if kind == 3:
        # self-as-of: last event of a chosen type at-or-before each
        # event (conditional running max — the q20 shape inside one
        # stream)
        et = rnd.choice(["view", "purchase", "signup", "click"])
        bound = rnd.choice(["1 PRECEDING", "CURRENT ROW"])
        return (
            f"SELECT event_id, user_id, "
            f"max(CASE WHEN event_type = '{et}' THEN ts END) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND {bound}) AS prev_ts "
            f"FROM events ORDER BY event_id")
    if kind == 4:
        # cross-table as-of with tolerance: newest event at-or-before
        # each order, optionally within a horizon (the q87 nearest-asof
        # shape as a correlated range scalar subquery)
        tol = (f" AND e.ts > o_orderdate - INTERVAL {rnd.randint(60, 5000)} MINUTE"
               if rnd.random() < 0.5 else "")
        expr = rnd.choice(["max(e.ts)", "min(e.ts)", "count(*)"])
        return (
            f"SELECT o_orderkey, (SELECT {expr} FROM events e "
            f"WHERE e.user_id = o_custkey AND e.ts <= o_orderdate{tol}) "
            f"AS asof_v FROM orders ORDER BY o_orderkey")
    # SCD-style run compaction: contiguous same-type runs per user
    agg = rnd.choice(["count(*) AS len",
                      "count(*) AS len, min(ts) AS valid_from"])
    return (
        f"WITH m AS (SELECT user_id, ts, event_id, event_type, "
        f"CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type "
        f"THEN 1 ELSE 0 END AS chg FROM events WINDOW w AS {w}), "
        f"r AS (SELECT user_id, event_type, ts, sum(chg) OVER "
        f"(PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS UNBOUNDED PRECEDING) AS run FROM m) "
        f"SELECT user_id, run, event_type, {agg} FROM r "
        f"GROUP BY user_id, run, event_type ORDER BY user_id, run, event_type")


def gen_query(rnd):
    r = rnd.random()
    # keep join coverage at ~15% — inserting the subquery branch must
    # shift every later threshold, not eat the join band
    if r < 0.10:
        return gen_subquery_query(rnd)
    if r < 0.25:
        return gen_join_query(rnd)
    if r < 0.38:
        return gen_window_query(rnd)
    if r < 0.46:
        return gen_rollup_query(rnd)
    if r < 0.54:
        return gen_setop_query(rnd)
    if r < 0.60:
        return gen_percentile_query(rnd)
    if r < 0.66:
        return gen_text_query(rnd)
    if r < 0.82:
        # temporal band eats into the ad-hoc tail, not the bands above
        return gen_temporal_query(rnd)
    t = rnd.choice(list(TABLES))
    cols = TABLES[t]
    preds = []
    for _ in range(rnd.randint(0, 2)):
        if rnd.random() < 0.6:
            c = rnd.choice(cols["num"])
            op = rnd.choice(["<", "<=", ">", ">=", "<>"])
            v = round(rnd.uniform(0, 200), 2)
            preds.append(f"{c} {op} {v}")
        else:
            c = rnd.choice(cols["cat"])
            preds.append(f"{c} IS NOT NULL" if rnd.random() < 0.2
                         else f"length({c}) >= {rnd.randint(1,5)}")
    where = (" WHERE " + rnd.choice([" AND ", " OR "]).join(preds)) if preds else ""
    if rnd.random() < 0.75:
        keys = rnd.sample(cols["cat"] + cols["num"][:1], rnd.randint(1, 2))
        aggs = []
        for i in range(rnd.randint(1, 3)):
            fn = rnd.choice(["sum", "avg", "min", "max", "count"])
            c = rnd.choice(cols["num"])
            aggs.append(f"{fn}({c}) AS a{i}")
        having = f" HAVING count(*) > {rnd.randint(0,3)}" if rnd.random() < 0.3 else ""
        sel = ", ".join(keys + aggs + ["count(*) AS n"])
        orderby = ", ".join(f"{k} NULLS LAST" for k in keys)
        return (f"SELECT {sel} FROM {t}{where} "
                f"GROUP BY {', '.join(keys)}{having} ORDER BY {orderby}")
    else:
        sel = ", ".join(cols["all"])
        orderby = ", ".join(f"{c} NULLS LAST" for c in cols["all"])
        limit = f" LIMIT {rnd.randint(10, 500)}" if rnd.random() < 0.5 else ""
        return f"SELECT {sel} FROM {t}{where} ORDER BY {orderby}{limit}"


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
    shutil.rmtree(OUT, ignore_errors=True)  # stale dirs from a prior
    # seed would silently stand in for failed queries
    rnd = random.Random(SEED)
    queries = {f"f{i:03d}": gen_query(rnd) for i in range(N)}
    with open("/tmp/fuzz_queries.json", "w") as f:
        json.dump(queries, f, indent=1)
    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.SqlRunner {SF} /tmp/fuzz_queries.json {OUT}"],
        cwd="/root/repo", check=True, capture_output=True)
    con = duckdb.connect()
    for t in list(TABLES) + ["customer", "nation", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(queries.items()):
        try:
            o = con.sql(sql)
            ocols, orows = canon(o.fetchall(), [d[0] for d in o.description])
            s = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            scols, srows = canon(s.fetchall(), [d[0] for d in s.description])
        except Exception as e:
            print(f"FAIL {name}: harness error {e}\n  SQL: {sql}")
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
            print(f"  SQL: {sql}")
    print(f"== fuzz: {n_pass} pass, {n_fail} fail (seed={SEED}, n={N}) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
