#!/usr/bin/env python3
"""sf1-scale DuckDB gate for the embedding-family queries (d8, x7, x8).

The monolithic oracle SQL in SparkEntry.oracleSql is what the DRIVER runs
at sf0.01, where it is fine. At sf1 (20k vectors, 2000 per IVF cell) the
within-cell pair join carries two 64-double lists per candidate through
two further norm joins before the similarity filter prunes — DuckDB
materializes tens of GB and OOMs (observed: 121 GB RSS).

This harness executes the SAME oracle semantics in stages so the filter
applies AT the pair join:
  1. materialize (vec_id, label, emb, nsq [, bucket]) as a temp table;
  2. pair scan with the threshold as a join filter (survivors only —
     values bit-identical to the monolithic form: same list_dot_product,
     same sqrt, same operand order);
  3. the remaining pipeline (components via recursive CTE, centroids,
     keep windows) runs over the small survivor set, verbatim from the
     oracle text.
Then compares against the Spark parquet with check.py's canonicalization.

Usage: python3 tools/sf1_embed_gate.py <sfDir> <verifyOutDir> <query>...
"""
import sys, os, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
queries = sys.argv[3:] or ["d8_embedding_dups", "x7_semdedup", "x8_semdedup_srp"]

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
con.execute("SET temp_directory='/tmp/graft_duck_spill'")
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sfdir}/embeddings.parquet')")

# Stage 1: vectors + norms (+ SRP bucket for x8, read from the oracle SQL
# the engine publishes so the hyperplane constants cannot drift: we pull
# the bucket expression out of the x8 oracle text).
con.execute("""
CREATE TEMP TABLE vt AS
SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
       list_dot_product(CAST(embedding AS DOUBLE[]),
                        CAST(embedding AS DOUBLE[])) AS nsq
FROM embeddings""")

import json
oracle_all = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def srp_multi_bucket_body():
    """Extract the generated MULTI-TABLE SRP bucket union from the x8
    oracle text (the body of 'bk AS (...)': one SELECT per hash table,
    each ending 'AS b FROM v'), and widen each per-table SELECT with the
    nsq column so the staged pair join needs no further norm join."""
    sql = oracle_all["x8_semdedup_srp"]
    start = sql.index("bk AS (\n") + len("bk AS (\n")
    end = sql.index("),\np AS (")
    return sql[start:end].replace("SELECT vec_id, emb, ",
                                  "SELECT vec_id, emb, nsq, ")

def make_pairs(key_sql):
    con.execute("DROP TABLE IF EXISTS pairs")
    con.execute(f"""
CREATE TEMP TABLE pairs AS
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM vt a JOIN vt b ON {key_sql}
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.emb, b.emb) / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.4""")
    return con.execute("SELECT count(*) FROM pairs").fetchone()[0]

# Stage 3 SQL: verbatim the closure/centroid/keep tails of the oracles,
# rebased on the pairs temp table (p -> pairs).
CLOSURE = """
edges AS (SELECT id_a AS s, id_b AS d FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT e2.d AS id, reach.r FROM reach JOIN edges e2 ON e2.s = reach.id),
comps AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)"""

D8_SQL = f"""WITH RECURSIVE {CLOSURE}
SELECT em.vec_id, COALESCE(comps.comp, em.vec_id) AS cluster_id,
  em.vec_id = COALESCE(comps.comp, em.vec_id) AS keep
FROM embeddings em LEFT JOIN comps ON comps.id = em.vec_id
ORDER BY em.vec_id"""

CENTROID_KEEP = """
e AS (SELECT label, t.i AS dim, emb[t.i] AS x
      FROM vt, (SELECT unnest(range(1, 65)) AS i) t),
g AS (SELECT label, dim, list_sort(list(x)) AS xs, count(*) AS cnt
      FROM e GROUP BY label, dim),
c AS (SELECT label, dim,
    ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
      (a, b) -> a + b) / cnt, 6) AS centroid
  FROM g),
cv AS (SELECT label, list(centroid ORDER BY dim) AS cvec FROM c GROUP BY label),
cs AS (SELECT vt.vec_id,
    ROUND(list_dot_product(vt.emb, cv.cvec) /
      NULLIF(sqrt(list_dot_product(vt.emb, vt.emb))
             * sqrt(list_dot_product(cv.cvec, cv.cvec)), 0.0), 6)
      AS centroid_sim
  FROM vt JOIN cv ON vt.label = cv.label),
m AS (SELECT em.vec_id, COALESCE(comps.comp, em.vec_id) AS cluster_id,
    cs.centroid_sim
  FROM embeddings em
  LEFT JOIN comps ON comps.id = em.vec_id
  JOIN cs ON cs.vec_id = em.vec_id)
SELECT vec_id, cluster_id, centroid_sim,
  row_number() OVER (PARTITION BY cluster_id
    ORDER BY centroid_sim ASC NULLS LAST, vec_id ASC) = 1 AS keep
FROM m ORDER BY vec_id"""

X_SQL = f"WITH RECURSIVE {CLOSURE},{CENTROID_KEEP}"

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"): return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return repr(float(v))
    except Exception: pass
    return repr(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

fails = 0
for q in queries:
    if q in ("d8_embedding_dups", "x7_semdedup"):
        n = make_pairs("a.label = b.label")
    elif q == "x8_semdedup_srp":
        body = srp_multi_bucket_body()
        con.execute("CREATE OR REPLACE TEMP VIEW v AS SELECT vec_id, emb, nsq FROM vt")
        con.execute("DROP TABLE IF EXISTS bt")
        con.execute(f"CREATE TEMP TABLE bt AS {body}")
        con.execute("DROP TABLE IF EXISTS pairs")
        con.execute("""CREATE TEMP TABLE pairs AS
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bt a JOIN bt b ON a.t = b.t AND a.b = b.b
            WHERE a.vec_id < b.vec_id
              AND list_dot_product(a.emb, b.emb) / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.4""")
        n = con.execute("SELECT count(*) FROM pairs").fetchone()[0]
    else:
        print(f"SKIP {q}: not an embedding-family query"); continue
    print(f"[{q}] surviving pairs: {n}", flush=True)
    sql = D8_SQL if q == "d8_embedding_dups" else X_SQL
    ores = con.execute(sql)
    ocols = [c[0] for c in ores.description]
    orows = ores.fetchall()
    sres = con.execute(f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')")
    scols = [c[0] for c in sres.description]
    srows = sres.fetchall()
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        print(f"FAIL {q}: schema mismatch spark={sc} oracle={oc}"); fails += 1; continue
    if sr != orr:
        bad = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b][:3]
        print(f"FAIL {q}: value mismatch rows={len(sr)} vs {len(orr)} at {bad}")
        for i in bad[:3]:
            print(f"   spark : {sr[i] if i < len(sr) else None}")
            print(f"   oracle: {orr[i] if i < len(orr) else None}")
        fails += 1; continue
    print(f"PASS {q} ({len(sr)} rows)", flush=True)

print(f"== {fails} failures / {len(queries)} checked ==")
sys.exit(1 if fails else 0)
