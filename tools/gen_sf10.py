#!/usr/bin/env python3
"""Builder-side sfN GRAPH slice for the decade scale checks
(round 13; gen_sf1.py is the first decade, --copies 100 the second
[sf10, the default], --copies 1000 the third [sf100]).

Only the graph-bearing table is scaled: the capped wedge twins
(qD1_pymk_capped, qX_pymk_decayed_capped, qX_ktruss,
qX_linkpred_capped, qX_adamic_adar_capped, qX_c4_sampled) read
`events` alone, and a full-corpus synthesis would be minutes of work
for tables the sweep never touches.

- events: `--copies` copies of sf0.1 (100k rows, 1500 users each),
  event_id/user_id offset per copy, ts jittered +c*37ms — same tiling
  rule as gen_sf1, so the 50 FIXED hubs (dst = value % 50) grow their
  degree `copies`x: exactly the shape that kills uncapped wedge
  enumeration.
- everything else: copied from sf0.1 as-is (present so Tables.load
  of a dim never 404s; scale-neutral for the sweep).

Deterministic; safe to re-run (overwrites OUT).
"""
import os, sys, shutil, random, collections, bisect
import duckdb

SRC = "/root/testdata/sf0.1"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
FULL = "--full" in sys.argv
OUT = args[0] if args else "/tmp/sf10"
COPIES = 100
for a in sys.argv[1:]:
    if a.startswith("--copies="):
        COPIES = int(a.split("=", 1)[1])

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

for t in ["region", "nation", "customer", "supplier", "part", "orders"] + \
        ([] if FULL else ["lineitem", "documents", "embeddings"]):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"copied {t}")

# Past ~1000 copies a single COPY materializes the whole cross join
# (measured: 82 GB RSS and climbing at 10000 copies — an in-memory
# duckdb cannot spill), so large tilings chunk into <=1000-copy part
# files under an events.parquet DIRECTORY, which Spark's parquet
# reader (and duckdb's glob) treats identically to the single file.
def tile_events(dst, lo, hi):
    con.execute(f"""
      COPY (
        SELECT e.event_id + c.c * 100000 AS event_id,
               e.ts + to_microseconds(c.c * 37000) AS ts,
               e.user_id + c.c * 1500 AS user_id,
               e.event_type, e.value, e.props
        FROM '{SRC}/events.parquet' e
        CROSS JOIN (SELECT unnest(range({lo}, {hi})) AS c) c
      ) TO '{dst}' (FORMAT parquet)""")

if COPIES <= 1000:
    tile_events(f"{OUT}/events.parquet", 0, COPIES)
else:
    part_dir = f"{OUT}/events.parquet"
    shutil.rmtree(part_dir, ignore_errors=True)
    os.makedirs(part_dir)
    for lo in range(0, COPIES, 1000):
        hi = min(lo + 1000, COPIES)
        tile_events(f"{part_dir}/part-{lo:06d}.parquet", lo, hi)
        print(f"  events copies [{lo}, {hi})")
print(f"events tiled x{COPIES}")

if not FULL:
    print(f"sf10 graph slice ready at {OUT}")
    sys.exit(0)

# --full: the text/vector decade too (gen_sf1's resampling rules —
# tiling texts would plant 99 exact twins per doc and degenerate the
# dedup gates into pair explosions the real distribution lacks)
con.execute(f"""
  COPY (
    SELECT l.l_orderkey + c.c * 150000 AS l_orderkey,
           l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
           l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
           l.l_linestatus, l.l_shipdate
    FROM '{SRC}/lineitem.parquet' l
    CROSS JOIN (SELECT unnest(range({COPIES})) AS c) c
  ) TO '{OUT}/lineitem.parquet' (FORMAT parquet)""")
print(f"lineitem tiled x{COPIES}")

rows = con.execute(
    f"SELECT text, lang, source FROM '{SRC}/documents.parquet'").fetchall()
vocab = collections.Counter()
lengths = []
langs = collections.Counter()
sources = collections.Counter()
for text, lang, source in rows:
    toks = text.split()
    vocab.update(toks)
    lengths.append(len(toks))
    langs[lang] += 1
    sources[source] += 1
words = list(vocab.keys())
# cumulative weights once: 50M+ token draws would otherwise rebuild
# the cumulative distribution per call inside random.choices
cum = []
acc = 0
for w in words:
    acc += vocab[w]
    cum.append(acc)
lang_k = list(langs.keys()); lang_w = [langs[k] for k in lang_k]
src_k = list(sources.keys()); src_w = [sources[k] for k in src_k]
rng = random.Random(47)
n_docs = len(rows) * COPIES
con.execute("""CREATE TABLE docs (doc_id BIGINT, text VARCHAR,
  lang VARCHAR, source VARCHAR, n_chars BIGINT)""")
batch = []
for i in range(n_docs):
    n = rng.choice(lengths)
    text = " ".join(
        words[bisect.bisect(cum, rng.random() * acc)] for _ in range(n))
    batch.append((i, text, rng.choices(lang_k, weights=lang_w)[0],
                  rng.choices(src_k, weights=src_w)[0], len(text)))
    if len(batch) == 50000:
        con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", batch)
        batch = []
        print(f"  docs {i+1}/{n_docs}")
if batch:
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", batch)
con.execute(f"COPY docs TO '{OUT}/documents.parquet' (FORMAT parquet)")
print(f"documents regenerated: {n_docs}")

emb = con.execute(
    f"SELECT embedding, label FROM '{SRC}/embeddings.parquet'").fetchall()
dim = len(emb[0][0])
n_emb = len(emb) * COPIES
mean = [0.0] * dim
for v, _ in emb:
    for j in range(dim):
        mean[j] += v[j]
mean = [m / len(emb) for m in mean]
var = [0.0] * dim
for v, _ in emb:
    for j in range(dim):
        var[j] += (v[j] - mean[j]) ** 2
sd = [(x / len(emb)) ** 0.5 for x in var]
label_k = sorted({l for _, l in emb})
con.execute("""CREATE TABLE embs (vec_id BIGINT, embedding FLOAT[],
  label INTEGER)""")
ebatch = []
for i in range(n_emb):
    ebatch.append((i, [rng.gauss(mean[j], sd[j]) for j in range(dim)],
                   rng.choice(label_k)))
    if len(ebatch) == 20000:
        con.executemany("INSERT INTO embs VALUES (?,?,?)", ebatch)
        ebatch = []
if ebatch:
    con.executemany("INSERT INTO embs VALUES (?,?,?)", ebatch)
con.execute(f"COPY embs TO '{OUT}/embeddings.parquet' (FORMAT parquet)")
print(f"embeddings regenerated: {n_emb}")
print(f"full sf10 ready at {OUT}")
