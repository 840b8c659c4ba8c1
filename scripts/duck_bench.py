#!/usr/bin/env python3
"""Head-to-head: time each oracle SQL in DuckDB against a scale-factor dir.

Usage: python3 scripts/duck_bench.py <sfDir> <verifyOutDir-with-oracle_sql.json>

Context for the numbers (see BASELINE.md): DuckDB is an embedded vectorized
engine with ~zero per-query setup; Spark pays a fixed ~0.3-0.5 s per query
(job scheduling, whole-stage-codegen Janino compilation) that dominates at
sub-GB scale factors and vanishes into the linear term at cluster scale.
The per-query delta beyond that constant is the signal to optimize.
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    total = 0.0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            total += dt
            print(f"{name:28s} {dt:7.3f} s")
        except Exception as e:
            print(f"{name:28s} ERROR {e}")
    print(f"{'TOTAL':28s} {total:7.3f} s")

if __name__ == "__main__":
    main()
