#!/usr/bin/env python3
"""Builds the 10x-duplication stress corpus used by SCALE.md's round-3
measurements: N tagged copies of the sf0.1 documents (unique doc_ids,
per-copy text tag so fingerprints differ but shingles mostly survive)
and N copies of the embeddings with a tiny per-copy scale drift (cosine
~1 within a copy group). Companion tables are copied as-is.

Usage: python3 tools/make_stress.py [outdir] [copies] [--stopwords]
       (defaults /tmp/sfbig 10)
Then:  SPARK_GRAFT_SF_DIR=<outdir> SPARK_GRAFT_ONLY=d1_...,d2_... \
         sbt "runMain graft.Bench"

--stopwords additionally appends ten filler words to EVERY document
(df = 100%), the real-corpus property the synthetic tables lack: the
sf0.1 vocabulary's hottest term sits at df 78.5% of docs, just below
the ~82% where the 0.2-nat idf cutoff starts pruning — so on the plain
stress corpus BM25 pruning is a no-op and any speedup measured there
is run-order drift (the round-9 measurement lesson). With stopwords
planted, every query term list contains ten df=100% terms whose
postings fan the inverted-index join out to |corpus| rows per query —
the hazard the minIdfMicro knob exists to bound.
"""
import shutil, sys
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
out = args[0] if len(args) > 0 else "/tmp/sfbig"
n = int(args[1]) if len(args) > 1 else 10
# optional 3rd arg: source corpus (e.g. /tmp/sf1 for the 512k-doc
# decade probe — 10 tagged copies of the constant-density sf1 set)
src = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
stop_suffix = (" the of and to a is in it on as"
               if "--stopwords" in sys.argv else "")

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
# Copy offsets must clear the SOURCE's id range: the original fixed
# 10M/1M offsets silently collided when the source was /tmp/sf1 (whose
# make_sf1 ids reach ~200M), leaving the "512k-doc" decade corpus with
# only 107k distinct doc_ids — duplicate ids break the split-bucket
# phases and inflate apparent duplication (round-10 find).
doc_off, vec_off = con.execute(
    f"SELECT (SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')), "
    f"(SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet'))"
).fetchone()
con.execute(f"""
COPY (
  SELECT doc_id + i * {doc_off} AS doc_id,
         text || ' copytag' || CAST(i AS VARCHAR) || '{stop_suffix}' AS text,
         lang, source,
         CAST(length(text) + 8 + length(CAST(i AS VARCHAR))
              + {len(stop_suffix)} AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet')
  CROSS JOIN (SELECT unnest(range(0, {n})) AS i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT vec_id + i * {vec_off} AS vec_id,
         CAST(list_transform(embedding, x -> x * (1.0 + i * 0.00001)) AS FLOAT[]) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet')
  CROSS JOIN (SELECT unnest(range(0, {n})) AS i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
dd, dv = con.execute(
    f"SELECT (SELECT count(DISTINCT doc_id) FROM read_parquet('{out}/documents.parquet')), "
    f"(SELECT count(DISTINCT vec_id) FROM read_parquet('{out}/embeddings.parquet'))").fetchone()

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
docs, vecs = (con.execute(f"SELECT (SELECT count(*) FROM read_parquet('{out}/documents.parquet')), "
                          f"(SELECT count(*) FROM read_parquet('{out}/embeddings.parquet'))").fetchone())
assert dd == docs and dv == vecs, f"id collision: {dd}/{docs} docs, {dv}/{vecs} vecs distinct"
print(f"wrote {out}: documents={docs} embeddings={vecs} (x{n}, ids distinct)")
