#!/usr/bin/env python3
"""Dev-only local replica of the driver's t2 correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark); this
is build-time tooling that mimics the driver's compare so oracle SQL can
be validated before a round ends: run graft.Verify to dump each query's
result parquet + oracle_sql.json, then run each oracle in DuckDB over
the same test tables and diff (columns sorted by name, rows sorted,
exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # match on repr; driver hashes values, so exact-ish
                v = float(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return ([c for _, c in sorted(zip(range(len(cols)), cols), key=lambda p: cols[p[0]])],
            [str(types[i]) for i in order], out)


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got_types, got = canon(got_rel.fetchall(), got_rel.columns,
                                             got_rel.types)
            exp_rel = con.sql(sql)
            exp_cols, exp_types, exp = canon(exp_rel.fetchall(), exp_rel.columns,
                                             exp_rel.types)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
            continue
        if got_types != exp_types:
            # the driver's compare hashes TYPED values: an uncast DuckDB
            # sum() widens to HUGEINT / DECIMAL(38,2) and hash-mismatches
            # a value-identical Spark BIGINT / DECIMAL(28,2) column —
            # catch that here, before the driver does (round-4 lesson)
            diffs = [f"{c}: spark={g} oracle={e}"
                     for c, g, e in zip(got_cols, got_types, exp_types) if g != e]
            print(f"FAIL {name}: result types differ ({'; '.join(diffs)})")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp))
               if not all(eq(x, y) for x, y in zip(g, e))]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; first at {i}:")
            print(f"  cols: {got_cols}")
            print(f"  got : {g}")
            print(f"  exp : {e}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
