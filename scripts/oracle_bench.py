#!/usr/bin/env python3
"""Time every driver oracle SQL in DuckDB — the ORACLE_BENCH.json artifact.

Usage: python3 scripts/oracle_bench.py <sfDir> <verifyOutDir> [outFile]

<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
Each oracle runs once, fully materialized (fetchall), against the sf
parquet tables; output mirrors the BENCH.json shape so the per-query
Spark/DuckDB ratios line up by name.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_file = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_BENCH.json"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times, errors = {}, {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as ex:  # noqa: BLE001 - record and continue
            errors[name] = str(ex).split("\n")[0]
        print(f"{name:32s} {times.get(name, 'ERROR')}", flush=True)
    total = round(sum(times.values()), 1)
    doc = {"metric": f"oracle_duckdb_{os.path.basename(sf_dir.rstrip('/'))}",
           "total": total, "queries": times, "errors": errors}
    with open(out_file, "w") as f:
        json.dump(doc, f, indent=0)
        f.write("\n")
    print(f"total {total}s over {len(times)} oracles, {len(errors)} errors")

if __name__ == "__main__":
    main()
