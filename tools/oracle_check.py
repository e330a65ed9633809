#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
parquet tables in <sfDir>, loads the Spark result parquet from
<outDir>/<name>/, canonicalizes both (sort columns by name, sort rows,
stringify values), and reports match/mismatch per query.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_r1
"""
import sys, json, glob, math

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


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single-file tables; ScaleLab replicas are
        # Spark-written DIRECTORIES of part files — glob accordingly
        path = f"{sf_dir}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and not name.startswith(only):
            continue
        sql = oracle[name]
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
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
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_bad += 1
        elif orr != srr:
            diff = [(a, b) for a, b in zip(orr, srr) if a != b][:3]
            print(f"FAIL {name}: rows differ (o={len(orr)} s={len(srr)}) "
                  f"first diffs: {diff}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(srr)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
