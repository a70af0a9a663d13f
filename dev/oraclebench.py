#!/usr/bin/env python3
"""Dev-only: time every DuckDB oracle query at a given scale factor —
the single-node baseline the graft bench total is compared against.

Usage: python3 dev/oraclebench.py <verify_out_dir> <sf_dir> [threads] [timeout_sec]
  <verify_out_dir> must contain oracle_sql.json (from graft.Verify).
  timeout_sec (optional): interrupt any single query running longer;
  it is reported as {"timeout": N} instead of a time and excluded from
  total_sec (n_timeouts counts them). Scale-up runs need this — some
  oracle formulations (recursive closure CTEs, replicated-LSH joins)
  are exponential-ish in data size and would otherwise run for hours.
"""
import json
import os
import sys
import threading
import time

import duckdb


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else None
    con = duckdb.connect()
    con.execute(f"SET threads = {threads}")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written dataset directory
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    total = 0.0
    per = {}
    n_timeouts = 0
    def fresh_con():
        c = duckdb.connect()
        c.execute(f"SET threads = {threads}")
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        return c

    for name, sql in sorted(oracle.items()):
        timer = None
        if timeout is not None:
            timer = threading.Timer(timeout, con.interrupt)
            timer.start()
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            dt = time.monotonic() - t0
            per[name] = round(dt, 3)
            total += dt
        except duckdb.InterruptException:
            dt = time.monotonic() - t0
            if timeout is not None and dt < timeout * 0.9:
                # timer-race artifact: a PREVIOUS query's interrupt fired
                # after its fetchall but before cancel, landing on this
                # (innocent) query — retry once on a fresh connection
                # rather than record a spurious sub-timeout "timeout"
                con = fresh_con()
                timer.cancel()
                timer = threading.Timer(timeout, con.interrupt)
                timer.start()
                t0 = time.monotonic()
                try:
                    con.sql(sql).fetchall()
                    dt = time.monotonic() - t0
                    per[name] = round(dt, 3)
                    total += dt
                except duckdb.InterruptException:
                    per[name] = {"timeout": timeout}
                    n_timeouts += 1
                    con = fresh_con()
            else:
                per[name] = {"timeout": timeout}
                n_timeouts += 1
                # interrupted connections can carry state; start clean
                con = fresh_con()
        finally:
            if timer is not None:
                timer.cancel()
    out = {"engine": "duckdb", "threads": threads, "sf": sf_dir,
           "total_sec": round(total, 2), "n_queries": len(per),
           "queries": per}
    if timeout is not None:
        out["timeout_sec"] = timeout
        out["n_timeouts"] = n_timeouts
    print(json.dumps(out))


if __name__ == "__main__":
    main()
