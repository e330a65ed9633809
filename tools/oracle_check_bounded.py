#!/usr/bin/env python3
"""oracle_check with per-statement wall timeout + DuckDB memory cap —
the sf1 (10x) leg's runner: a handful of oracle statements (the
recursive-CTE q61 family, the quadratic exact joins) are DUCKDB-
infeasible at 50k docs and must report as 'oracle timeout' instead of
wedging the whole pass or OOMing the host.

Usage: oracle_check_bounded.py <sfDir> <outDir> [timeoutSec] [skipDone.log] [skipPrefixes]
  skipPrefixes: comma list; matching statements report as oracle-infeasible.
  skipDone.log: a prior partial run's output; statements already ok/FAIL
  there are skipped (resume).
"""
import sys, json, glob, math, os, threading

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, timeout_sec=900, skip_log=None, skip_prefixes=None):
    done = set()
    if skip_log and os.path.exists(skip_log):
        for line in open(skip_log):
            if line.startswith(("ok ", "ok\t", "FAIL ")):
                done.add(line.split()[1].rstrip(":"))
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    con.execute("SET threads=24")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name in sorted(oracle):
        if name in done:
            n_skip += 1
            continue
        if skip_prefixes and any(name.startswith(px) for px in skip_prefixes):
            print(f"FAIL {name}: oracle infeasible at this scale (skipped by policy)",
                  flush=True)
            n_bad += 1
            continue
        # spark-output existence FIRST: a subset Verify dump leaves most
        # queries without output, and running their oracles anyway cost
        # up to timeout_sec each (the heavy span/minhash statements made
        # a 10-query subset check take 90+ minutes)
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            print(f"FAIL {name}: no spark output", flush=True)
            n_bad += 1
            continue
        sql = oracle[name]
        timer = threading.Timer(timeout_sec, con.interrupt)
        timer.start()
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"FAIL {name}: oracle error: {msg}", flush=True)
            n_bad += 1
            continue
        finally:
            timer.cancel()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True)
            n_bad += 1
            continue
        res2 = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        scols = [d[0] for d in res2.description]
        srows = res2.fetchall()
        oc, orr = canon(ocols, orows)
        sc, srr = canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}",
                  flush=True)
            n_bad += 1
        elif orr != srr:
            diff = [(a, b) for a, b in zip(orr, srr) if a != b][:3]
            print(f"FAIL {name}: rows differ (o={len(orr)} s={len(srr)}) "
                  f"first diffs: {diff}", flush=True)
            n_bad += 1
        else:
            print(f"ok   {name} ({len(srr)} rows)", flush=True)
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail, {n_skip} skipped (prior log)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 900,
                  sys.argv[4] if len(sys.argv) > 4 else None,
                  sys.argv[5].split(",") if len(sys.argv) > 5 else None))
