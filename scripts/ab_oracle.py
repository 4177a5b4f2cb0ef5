#!/usr/bin/env python3
"""Time ONE driver oracle SQL in DuckDB, warmup + min-of-5 — the DuckDB
half of the WeakRecert interleaved A/B (S/D/S/D passes).

Usage: python3 scripts/ab_oracle.py <query> <sfDir> <verifyOutDir>
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    name, sf_dir, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        # ScaleFixture dirs (x1/x10) carry only the 5 tables the scale
        # suite reads — a missing table must not kill an A/B whose query
        # never touches it (the query itself still fails loudly if
        # needed). Fixture tables are Spark parquet DIRECTORIES; the
        # driver testdata tables are single files — glob accordingly.
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue  # fixture dirs carry only the tables their suite reads
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        # anything else (malformed/unreadable parquet) propagates: a view
        # the query needs must fail HERE, not as a confusing downstream
        # "table does not exist"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))[name]
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    con.execute(sql).fetchall()  # warmup (buffer pool, plan cache)
    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        con.execute(sql).fetchall()
        runs.append(round(time.time() - t0, 3))
    print(json.dumps({"metric": "weak_recert_oracle", "query": name,
                      "sf": sf_dir, "runs": runs, "min": min(runs)}))

if __name__ == "__main__":
    main()
