#!/usr/bin/env python3
"""Builds an sf1-equivalent corpus for the SCALE.md scaling curve: 10x
the sf0.1 documents/embeddings rows at CONSTANT near-duplication
density (unlike make_stress.py, which multiplies duplication 10x).

Each copy i is deterministically transformed so copies are NOT
near-duplicates of each other, while each copy internally preserves the
sf0.1 corpus's own duplication structure:
  - documents: per-copy vowel-substitution alphabet (copy 0 = identity).
    Shingling is word-based over lowercased text, so changing vowels
    changes nearly every word -> all cross-copy word n-grams differ.
  - embeddings: rotate the vector by i positions (norm-preserving, and
    near-orthogonal direction change for dense vectors), copy 0 = identity.

Usage: python3 tools/make_sf1.py [outdir] [copies]   (defaults /tmp/sf1 10)
Then:  SPARK_GRAFT_SF_DIR=<outdir> SPARK_GRAFT_ONLY=c1_...,d2_... \
         sbt "runMain graft.Bench"
"""
import os, shutil, sys
import duckdb

src = "/root/testdata/sf0.1"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# 10 distinct lowercase vowel maps; index 0 is the identity.
VOWEL_MAPS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
              "ycxwz", "bdfgh", "jklmn", "pqrst", "vwxyz"]
assert n <= len(VOWEL_MAPS), "add more vowel maps for copies > 10"

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

doc_cases = " ".join(
    f"WHEN {i} THEN translate(text, 'aeiouAEIOU', '{m}{m.upper()}')"
    for i, m in enumerate(VOWEL_MAPS[:n]))
# Planted heavy hitters (round-8: makes the t17 sf1 gate NON-vacuous —
# the vowel-map copies keep every real token's count flat while total n
# grows 10x, so nothing crosses the 1% threshold organically): 3 hot
# tokens, each in 400 docs x 100 occurrences = 40k >= 1.35% of the final
# ~2.95M tokens. Each hot occurrence is INTERLEAVED with a globally
# unique filler token, so every word bigram in a planted doc is unique —
# planted docs are not near-duplicates of anything (no d2/d3/d10 pairs,
# no LSH bucket collisions), they only shift the unigram distribution.
planted = """
  SELECT CAST(200000000 + t * 1000 + d AS BIGINT) AS doc_id,
         string_agg('graftplant' || t || ' f' || t || '_' || d || '_' || j,
                    ' ' ORDER BY j) AS text,
         'en' AS lang, 'planted' AS source,
         CAST(length(string_agg('graftplant' || t || ' f' || t || '_' || d
           || '_' || j, ' ' ORDER BY j)) AS BIGINT) AS n_chars
  FROM range(3) AS ts(t), range(400) AS ds(d), range(100) AS js(j)
  GROUP BY t, d
"""
con.execute(f"""
COPY (
  SELECT doc_id + i * 10000000 AS doc_id,
         CASE i {doc_cases} END AS text,
         lang, source,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet')
  CROSS JOIN (SELECT unnest(range(0, {n})) AS i)
  UNION ALL
  {planted}
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
# vector rotation: tail slice ++ head slice (1-indexed, inclusive slicing)
con.execute(f"""
COPY (
  SELECT vec_id + i * 1000000 AS vec_id,
         CAST(CASE WHEN i = 0 THEN embedding
              ELSE list_concat(embedding[(i + 1):], embedding[1:i]) END
              AS FLOAT[]) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet')
  CROSS JOIN (SELECT unnest(range(0, {n})) AS i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

docs, vecs, dims = con.execute(
    f"SELECT (SELECT count(*) FROM read_parquet('{out}/documents.parquet')), "
    f"(SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')), "
    f"(SELECT len(embedding) FROM read_parquet('{out}/embeddings.parquet') LIMIT 1)"
).fetchone()
print(f"wrote {out}: documents={docs} embeddings={vecs} dim={dims} (x{n}, constant dup density)")
