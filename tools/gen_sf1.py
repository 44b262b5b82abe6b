#!/usr/bin/env python3
"""Builder-side sf1 synthesis for the scale spot-check (round 12).

The driver ships sf{0.001,0.01,0.1}; the 10x-growth measurement needs
one more decade. This tiles/regenerates /root/testdata/sf0.1 into
OUT (default /tmp/sf1) preserving each table's generative structure:

- events:   10 copies, event_id/user_id offset per copy (15k users),
            ts jittered +c*37ms so no two copies collide on a stamp.
- lineitem: 10 copies, l_orderkey offset per copy (TPC-H key scaling).
- documents: 50k fresh docs sampled from sf0.1's empirical unigram
            and length distributions (seed 43) — tiling texts would
            plant 9 exact twins per doc and degenerate the dedup
            gates into pair explosions the real distribution lacks.
- embeddings: 20k fresh vectors from per-dimension normal moments of
            the sf0.1 table (seed 43), labels uniform over the
            observed label set.
- dims (region nation customer supplier part orders): copied as-is —
  scale-neutral for the heavy-gate measurement.

Deterministic; safe to re-run (overwrites OUT).
"""
import os, sys, shutil, random, collections
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
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
print("events tiled x10")

con.execute(f"""
  COPY (
    SELECT l.l_orderkey + c.c * 150000 AS l_orderkey,
           l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
           l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
           l.l_linestatus, l.l_shipdate
    FROM '{SRC}/lineitem.parquet' l
    CROSS JOIN (SELECT unnest(range({COPIES})) AS c) c
  ) TO '{OUT}/lineitem.parquet' (FORMAT parquet)""")
print("lineitem tiled x10")

# documents: empirical unigram + length distribution, fresh sample
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
weights = [vocab[w] for w in words]
lang_k = list(langs.keys()); lang_w = [langs[k] for k in lang_k]
src_k = list(sources.keys()); src_w = [sources[k] for k in src_k]
rng = random.Random(43)
n_docs = len(rows) * COPIES
doc_rows = []
for i in range(n_docs):
    n = rng.choice(lengths)
    text = " ".join(rng.choices(words, weights=weights, k=n))
    doc_rows.append((i, text, rng.choices(lang_k, weights=lang_w)[0],
                     rng.choices(src_k, weights=src_w)[0], len(text)))
con.execute("""CREATE TABLE docs (doc_id BIGINT, text VARCHAR,
  lang VARCHAR, source VARCHAR, n_chars BIGINT)""")
con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", doc_rows)
con.execute(f"COPY docs TO '{OUT}/documents.parquet' (FORMAT parquet)")
print(f"documents regenerated: {n_docs}")

# embeddings: per-dim normal moments, fresh sample
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
emb_rows = [(i,
             [rng.gauss(mean[j], sd[j]) for j in range(dim)],
             rng.choice(label_k))
            for i in range(n_emb)]
con.execute("""CREATE TABLE embs (vec_id BIGINT, embedding FLOAT[],
  label INTEGER)""")
con.executemany("INSERT INTO embs VALUES (?,?,?)", emb_rows)
con.execute(f"COPY embs TO '{OUT}/embeddings.parquet' (FORMAT parquet)")
print(f"embeddings regenerated: {n_emb}")
print(f"sf1 ready at {OUT}")
