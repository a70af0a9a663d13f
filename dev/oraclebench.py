#!/usr/bin/env python3
"""Dev-only: time every DuckDB oracle query at a given scale factor —
the single-node baseline the graft bench total is compared against.

Usage: python3 dev/oraclebench.py <verify_out_dir> <sf_dir> [threads]
  <verify_out_dir> must contain oracle_sql.json (from graft.Verify).
"""
import json
import sys
import time

import duckdb


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    con = duckdb.connect()
    con.execute(f"SET threads = {threads}")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    total = 0.0
    per = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.monotonic()
        con.sql(sql).fetchall()
        dt = time.monotonic() - t0
        per[name] = round(dt, 3)
        total += dt
    print(json.dumps({"engine": "duckdb", "threads": threads, "sf": sf_dir,
                      "total_sec": round(total, 2), "n_queries": len(per),
                      "queries": per}))


if __name__ == "__main__":
    main()
