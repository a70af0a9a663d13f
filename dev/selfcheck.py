#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate.

NOT part of the shipped library (the Scala engine has zero Python deps);
this just pre-validates that each SparkEntry query's parquet dump matches
its DuckDB oracle before the driver does the same at sf0.01.

Usage: python3 dev/selfcheck.py <verify_out_dir> <sf_dir>
  where <verify_out_dir> was produced by `sbt "runMain graft.Verify <sf_dir> <out>"`.
"""
import json
import os
import math
import sys

import duckdb


def canon(rows, cols):
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written dataset directory
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional 3rd arg (dev only): comma-separated subset of query names
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.sql(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            bad = next(i for i, (a, b) in enumerate(zip(g, e)) if a != b)
            print(f"FAIL {name}: values differ, first at sorted-row {bad}:\n  got {g[bad]}\n  exp {e[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
