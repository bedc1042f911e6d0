package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  private def corpus = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "quick brown fox jumps over lazy dog"),
      (10L, "quick brown fox jumps over sleepy dog"), // near-copy of 1
      (11L, "spark shuffles partition data across executors"),
      (12L, "entirely unrelated cooking recipe with butter and flour"),
      (13L, "the fox appears once here among other words"),
      (14L, "dog dog dog dog dog dog dog dog")) // tf saturation probe
      .toDF("doc_id", "text")
  }

  test("a query's near-copy outranks everything else") {
    val out = Bm25.topK(corpus.filter(col("doc_id") === 1), corpus,
        "doc_id", "text", k = 3)
      .orderBy(col("rank")).collect()
    assert(out(0).getLong(2) == 10L, s"near-copy not top-1: ${out.toSeq}")
    // self is excluded
    assert(!out.map(_.getLong(2)).contains(1L))
  }

  test("tf saturation: term spam cannot beat broad term overlap") {
    // doc 14 repeats 'dog' 8x; doc 10 shares 6 distinct terms with the
    // query — BM25's k1 saturation must rank 10 above 14
    val out = Bm25.topK(corpus.filter(col("doc_id") === 1), corpus,
        "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(2) -> r.getInt(1)).toMap
    assert(out(10L) < out(14L), s"tf spam outranked overlap: $out")
  }

  test("idf pruning drops only low-idf terms and keeps the ranking stable") {
    val all = Bm25.topK(corpus.filter(col("doc_id") === 1), corpus,
      "doc_id", "text", k = 3)
    // prune terms in over half the corpus (low idf) — the planted ranking
    // is carried by the rare terms and must not move
    val pruned = Bm25.topK(corpus.filter(col("doc_id") === 1), corpus,
      "doc_id", "text", k = 3, minIdfMicro = 400000)
    val a = all.orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    val b = pruned.orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(a.head == b.head, s"pruning moved the top hit: $a vs $b")
  }
}
