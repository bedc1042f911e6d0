#!/usr/bin/env python3
"""Builds the 10x-duplication stress corpus used by SCALE.md's round-3
measurements: N tagged copies of the sf0.1 documents (unique doc_ids,
per-copy text tag so fingerprints differ but shingles mostly survive)
and N copies of the embeddings with a tiny per-copy scale drift (cosine
~1 within a copy group). Companion tables are copied as-is.

Usage: python3 tools/make_stress.py [outdir] [copies]   (defaults /tmp/sfbig 10)
Then:  SPARK_GRAFT_SF_DIR=<outdir> SPARK_GRAFT_ONLY=d1_...,d2_... \
         sbt "runMain graft.Bench"
"""
import shutil, sys
import duckdb

src = "/root/testdata/sf0.1"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT doc_id + i * 10000000 AS doc_id,
         text || ' copytag' || CAST(i AS VARCHAR) AS text,
         lang, source,
         CAST(length(text) + 8 + length(CAST(i AS VARCHAR)) AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet')
  CROSS JOIN (SELECT unnest(range(0, {n})) AS i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT vec_id + i * 1000000 AS vec_id,
         CAST(list_transform(embedding, x -> x * (1.0 + i * 0.00001)) AS FLOAT[]) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet')
  CROSS JOIN (SELECT unnest(range(0, {n})) AS i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
docs, vecs = (con.execute(f"SELECT (SELECT count(*) FROM read_parquet('{out}/documents.parquet')), "
                          f"(SELECT count(*) FROM read_parquet('{out}/embeddings.parquet'))").fetchone())
print(f"wrote {out}: documents={docs} embeddings={vecs} (x{n})")
