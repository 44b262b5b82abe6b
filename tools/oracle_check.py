#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # sort columns by name, then sort rows by all columns (string repr)
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Verify writes an _ERROR marker per query whose plan threw — surface
    # those first so a broken query can never read as silently absent.
    failed_path = f"{outdir}/_FAILED.json"
    reported = set()
    if os.path.exists(failed_path):
        for name, msg in sorted(json.load(open(failed_path)).items()):
            print(f"FAIL {name}: verify error: {msg[:200]}"); n_fail += 1
            reported.add(name)
    for name, sql in sorted(oracle.items()):
        rdir = f"{outdir}/{name}"
        if os.path.exists(f"{rdir}/_ERROR"):
            # an orphan marker (crashed run or stale dir) must still
            # count as a failure, not silently vanish from the tally
            if name not in reported:
                print(f"FAIL {name}: orphan _ERROR marker (crashed/stale run)")
                n_fail += 1
            continue
        files = glob.glob(f"{rdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{rdir}/*.parquet'").df()
        e, g = norm(exp), norm(got)
        if list(e.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1; continue
        if len(e) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        mism = []
        for c in e.columns:
            ev, gv = e[c].astype(str), g[c].astype(str)
            bad = (ev != gv)
            if bad.any():
                i = bad.idxmax()
                mism.append(f"col {c} row {i}: got {gv[i]!r} want {ev[i]!r} ({int(bad.sum())} diffs)")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(e)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
