#!/usr/bin/env python3
"""Builder-side sf10 GRAPH slice for the second-decade scale check
(round 13; gen_sf1.py is the first decade).

Only the graph-bearing table is scaled: the capped wedge twins
(qD1_pymk_capped, qX_pymk_decayed_capped, qX_ktruss,
qX_linkpred_capped, qX_adamic_adar_capped, qX_c4_sampled) read
`events` alone, and a full sf10 corpus would be minutes of synthesis
for tables the sweep never touches.

- events: 100 copies of sf0.1 (1M rows, 150k users), event_id/user_id
  offset per copy, ts jittered +c*37ms — same tiling rule as gen_sf1,
  so the 50 FIXED hubs (dst = value % 50) grow their degree 100x:
  exactly the shape that kills uncapped wedge enumeration.
- everything else: copied from sf0.1 as-is (present so Tables.load
  of a dim never 404s; scale-neutral for the sweep).

Deterministic; safe to re-run (overwrites OUT).
"""
import os, sys, shutil
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
COPIES = 100

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"copied {t}")

con.execute(f"""
  COPY (
    SELECT e.event_id + c.c * 100000 AS event_id,
           e.ts + to_microseconds(c.c * 37000) AS ts,
           e.user_id + c.c * 1500 AS user_id,
           e.event_type, e.value, e.props
    FROM '{SRC}/events.parquet' e
    CROSS JOIN (SELECT unnest(range({COPIES})) AS c) c
  ) TO '{OUT}/events.parquet' (FORMAT parquet)""")
print(f"events tiled x{COPIES}")
print(f"sf10 graph slice ready at {OUT}")
