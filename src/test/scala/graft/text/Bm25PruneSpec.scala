package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The planted-stopword stress gate for the production pruning config
  * (VERDICT r8 #1): a term in EVERY document has
  * idf = ln(1 + 0.5/(N+0.5)) ≈ 0.5/N nats — far below the 0.2-nat
  * [[Bm25.DefaultMinIdfMicro]] cutoff — and its postings list is the
  * whole corpus. Pruning must (a) remove stopword-only candidates from
  * the join entirely (the fan-out the knob exists to bound) and (b)
  * leave the ranking carried by discriminative terms untouched. */
class Bm25PruneSpec extends SparkSpec {

  // every doc carries the planted stopword "zzz"; doc 3 shares ONLY the
  // stopword with the probe (doc 1); docs 2/4 share discriminative terms
  private def corpus = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "zzz alpha beta gamma"),
      (2L, "zzz alpha beta gamma delta"), // near-copy: must stay top-1
      (3L, "zzz totally unrelated content here"), // stopword-only decoy
      (4L, "zzz alpha something else entirely"),
      (5L, "zzz nothing shared again whatsoever"),
      (6L, "zzz more filler text rows"),
      (7L, "zzz yet another filler document"),
      (8L, "zzz filler continues unabated still"),
      (9L, "zzz last of the filler rows"))
      .toDF("doc_id", "text")
  }

  private def hits(minIdf: Long) =
    Bm25.topK(corpus.filter(col("doc_id") === 1), corpus, "doc_id", "text",
        k = 9, minIdfMicro = minIdf)
      .collect().map(r => r.getLong(2) -> r.getInt(1)).toMap

  test("stopword-only candidates are scored unpruned, GONE under the production cutoff") {
    val unpruned = hits(0L)
    val pruned = hits(Bm25.DefaultMinIdfMicro)
    // unpruned: the ubiquitous term makes every doc a candidate
    assert(unpruned.keySet == Set(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L), unpruned)
    // pruned: docs sharing ONLY the stopword never enter the join —
    // the postings fan-out the knob bounds at scale
    assert(pruned.keySet == Set(2L, 4L), pruned)
  }

  test("the ranking carried by discriminative terms is unchanged by pruning") {
    val unpruned = hits(0L)
    val pruned = hits(Bm25.DefaultMinIdfMicro)
    assert(pruned(2L) == 1 && unpruned(2L) == 1,
      s"near-copy not top-1: pruned=$pruned unpruned=$unpruned")
    assert(pruned(2L) < pruned(4L) && unpruned(2L) < unpruned(4L))
  }

  test("the planted stopword's idf sits below the production cutoff by construction") {
    // df = N = 9: idf_micro = round(ln(1 + 0.5/9.5) * 1e6) = 51293
    val idfMicro = math.round(math.log(1.0 + 0.5 / 9.5) * 1e6)
    assert(idfMicro < Bm25.DefaultMinIdfMicro, s"$idfMicro")
  }
}
