package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a SPARSE ranked list
  * (BM25, [[graft.text.Bm25]]) with a DENSE one (cosine ANN,
  * [[graft.similarity.Cosine]]) is the standard production RAG recall
  * stage (Cormack/Clarke/Büttcher, SIGIR 2009: reciprocal-rank fusion).
  *
  * RRF(d) = Σ_systems 1 / (k0 + rank_sys(d)) — rank-only, so it needs no
  * score normalization across heterogeneous systems. Engine-exactness:
  * each contribution is floor(1e9 / (k0 + rank)) in integer NANO units
  * (one exactly-rounded double divide then an unambiguous floor — no
  * round-half hazard, see SCALE.md), and the per-doc fold is an integer
  * SUM, associative under any partition merge order.
  *
  * Scale shape: contributions are map-side projections of the (already
  * small) top-k lists — |queries|·k rows per system — unioned into ONE
  * combine-enabled aggregate keyed on (query, doc); no join of the
  * ranked lists against each other and nothing proportional to corpus
  * size. The per-query re-rank window runs over ≤ Σ k rows per query. */
object Fusion {

  /** Fuse ranked lists. Each input must carry (queryCol, docCol, rankCol)
    * with rank starting at 1 and AT MOST ONE ROW per (query, doc) — a
    * list that repeats a doc would double-count its contribution and
    * inflate n_systems (top-k producers like Bm25.topK / Cosine.topK
    * satisfy this by construction). Rows beyond `perSystemK` are ignored
    * so callers can pass deeper lists than they fused last time without
    * changing decisions. Output: query_id, rank, doc_id, rrf_nano,
    * n_systems (how many lists surfaced the doc — the agreement signal). */
  def rrf(systems: Seq[DataFrame], queryCol: String, docCol: String,
          rankCol: String, k0: Int = 60, perSystemK: Int = 20,
          topK: Int = 10): DataFrame = {
    require(systems.nonEmpty, "rrf needs at least one ranked list")
    val contribs = systems.map { df =>
      df.filter(col(rankCol) <= perSystemK)
        .select(col(queryCol).as("qid"), col(docCol).as("did"),
          floor(lit(1000000000.0) / (lit(k0) + col(rankCol))).as("c"))
    }
    val fused = contribs.reduce(_ unionAll _)
      .groupBy(col("qid"), col("did"))
      .agg(sum(col("c")).as("rrf_nano"), count(lit(1)).as("n_systems"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_nano").desc, col("did").asc)
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("qid").as("query_id"), col("rank"),
        col("did").as("doc_id"), col("rrf_nano"), col("n_systems"))
  }
}
