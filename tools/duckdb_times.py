#!/usr/bin/env python3
"""Annotate bench_queries.json with per-query DuckDB oracle wall times.

The round's 2x-of-single-node bar was previously asserted from spot
checks; this makes it computed: every oracle-checkable query gets a
`duckdb_sec` entry (best of 2 runs of the SAME oracle SQL the
correctness gate uses, on the SAME parquet tables at the bench SF).

Usage: python3 tools/duckdb_times.py <bench_queries.json> <oracle_sql.json> <sf_dir>
Writes the merged artifact back in place, adding:
  "duckdb": {query: sec, ...}   (only oracle-backed queries)
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    bench_path, oracle_path, sfdir = sys.argv[1], sys.argv[2], sys.argv[3]
    bench = json.load(open(bench_path))
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    times = {}
    for name in sorted(bench.get("queries", {})):
        sql = oracle.get(name)
        if not sql:
            continue
        try:
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                runs.append(time.monotonic() - t0)
            times[name] = round(min(runs), 3)
        except Exception as e:
            print(f"[duckdb_times] {name}: {e}", file=sys.stderr)
    bench["duckdb"] = times
    with open(bench_path, "w") as f:
        json.dump(bench, f)
        f.write("\n")
    ok = {k for k, v in bench["queries"].items() if k in times and v >= 0}
    spark_total = sum(bench["queries"][k] for k in ok)
    duck_total = sum(times[k] for k in ok)
    print(f"{len(times)} oracle-timed queries; spark {spark_total:.1f}s vs duckdb {duck_total:.1f}s")

if __name__ == "__main__":
    main()
