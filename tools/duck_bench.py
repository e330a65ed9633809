#!/usr/bin/env python3
"""DuckDB comparator timing for BASELINE.md (r10 verdict "Next #3").

Runs every oracle SQL from <outDir>/oracle_sql.json (the Verify dump)
against the parquet tables in <sfDir> with threads=32, timing each
statement. Two passes: the first warms the OS page cache, the second
is the recorded wall. Run SEQUENCED on a calm host — never alongside a
Spark JVM (bench-host-variance protocol).

Usage: python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/verify_out
"""
import sys, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_pass(con, oracle):
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        con.execute(oracle[name]).fetchall()
        times[name] = time.time() - t0
    return times


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    walls = []
    for i in range(2):
        t0 = time.time()
        times = run_pass(con, oracle)
        walls.append(time.time() - t0)
        print(f"pass {i}: {walls[-1]:.1f} s over {len(times)} statements")
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:8]
    for name, sec in slow:
        print(f"  slowest: {name} {sec:.1f} s")
    print(json.dumps({"metric": "duckdb_oracle_wall", "unit": "sec",
                      "value": walls[-1], "walls": walls,
                      "statements": len(oracle), "sf_dir": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
