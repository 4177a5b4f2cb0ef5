#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sf parquet tables,
sorts columns by name and rows by all columns, and compares cell-by-cell.
Exit code 1 if any query mismatches.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def canon_type(t):
    """Canonical type label for the declared-type parity gate.

    Both sides are read through DuckDB (the Spark result via its written
    parquet, the oracle via DESCRIBE <sql>), so both arrive in DuckDB's
    type vocabulary; the only aliasing needed is the timestamp precision
    parquet round-trips introduce. Everything else — decimal precision/
    scale included — must match EXACTLY: the driver hashes serialized
    values, and a DECIMAL(28,7)-vs-DOUBLE or HUGEINT-vs-BIGINT drift that
    is value-equal still hash-fails (shipped 3 fails in r2, 2 in r4).
    """
    t = t.strip().upper()
    if t.endswith("[]"):
        return canon_type(t[:-2]) + "[]"
    # TIMESTAMP_NS / TIMESTAMP(6) / INT96 → TIMESTAMP, but tz-ness is a
    # REAL declared-type difference (naive vs WITH TIME ZONE serializes
    # differently) and must not be aliased away
    if t.startswith("TIMESTAMP") and "WITH" not in t:
        return "TIMESTAMP"
    return t

def type_mismatches(con, files, sql):
    got = {r[0]: canon_type(r[1]) for r in
           con.execute(f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
    exp = {r[0]: canon_type(r[1]) for r in
           con.execute(f"DESCRIBE {sql}").fetchall()}
    bad = []
    for c in sorted(set(got) | set(exp)):
        if got.get(c) != exp.get(c):
            bad.append(f"{c}: spark={got.get(c)} duck={exp.get(c)}")
    return bad

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b  # exact: parity discipline demands bit equality
    except TypeError:
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query-name filter — also the
    # chunking hook for full-sweep drivers (one fresh process per chunk
    # keeps long heavy-oracle sequences from accumulating allocator state)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    # bounded memory + a spill dir: the generated-kernel oracles (IVF CTE
    # chains) can balloon past RAM headroom under 32 threads; capping +
    # spilling turns an OutOfMemoryException into a slower-but-green run
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/graft_duck_tmp'")
    for t in TABLES:
        # driver fixtures are single files; ScaleFixture sweep fixtures are
        # Spark-written directories — glob the latter
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    discovered = sorted(d for d in os.listdir(out_dir)
                        if os.path.isdir(os.path.join(out_dir, d)))
    if only is not None:
        unknown = sorted(only - set(discovered))
        if unknown:
            # a typo'd or never-dumped name must FAIL the chunk, not
            # silently shrink it to a false all-green
            print(f"unknown query names in filter: {unknown}")
            sys.exit(1)
    names = [d for d in discovered if only is None or d in only]
    failures = []
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no spark output parquet")); continue
        got = duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            status = f"rows-only: {len(got)} rows " + ("OK" if len(got) > 0 else "EMPTY!")
            print(f"{name:32s} {status}")
            if len(got) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as ex:
            failures.append((name, f"oracle SQL error: {ex}")); continue
        # declared-type parity BEFORE the cell compare: value-equal type
        # drift is invisible to cells but fails the driver's hash
        drift = type_mismatches(con, files, oracle[name])
        if drift:
            failures.append((name, "type drift: " + "; ".join(drift)))
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"schema: spark={list(g.columns)} duck={list(e.columns)}"))
            continue
        if len(g) != len(e):
            failures.append((name, f"rowcount: spark={len(g)} duck={len(e)}"))
            continue
        bad = None
        gv, ev = g.values.tolist(), e.values.tolist()
        for i in range(len(gv)):
            for j in range(len(gv[i])):
                if not cmp_cell(gv[i][j], ev[i][j]):
                    bad = (i, g.columns[j], gv[i][j], ev[i][j])
                    break
            if bad:
                break
        if bad:
            failures.append((name, f"value row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
        else:
            print(f"{name:32s} MATCH ({len(g)} rows)")
    if failures:
        print("\n=== FAILURES ===")
        for n, msg in failures:
            print(f"{n:32s} {msg}")
        sys.exit(1)
    print("\nall queries match")

if __name__ == "__main__":
    main()
