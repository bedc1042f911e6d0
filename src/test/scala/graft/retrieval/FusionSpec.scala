package graft.retrieval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {

  // two ranked lists for one query: systems agree on doc 100 (rank 1/2),
  // disagree on the tail
  private def lists = {
    val sp = spark; import sp.implicits._
    val a = Seq((1L, 100L, 1), (1L, 200L, 2), (1L, 300L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 100L, 2), (1L, 400L, 1), (1L, 300L, 3))
      .toDF("query_id", "doc_id", "rank")
    (a, b)
  }

  test("doc surfaced by both systems beats single-system rank-1 docs") {
    val (a, b) = lists
    val out = Fusion.rrf(Seq(a, b), "query_id", "doc_id", "rank")
      .orderBy(col("rank")).collect()
    // 100: 1/(61) + 1/(62) > 400's 1/61 or 200's 1/62 alone
    assert(out(0).getLong(2) == 100L, s"consensus doc not fused top-1: ${out.toSeq}")
    assert(out(0).getLong(4) == 2L) // n_systems
  }

  test("nano contributions match the closed form and sum exactly") {
    val (a, b) = lists
    val out = Fusion.rrf(Seq(a, b), "query_id", "doc_id", "rank")
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    def c(rank: Int) = math.floor(1000000000.0 / (60 + rank)).toLong
    assert(out(100L) == c(1) + c(2))
    assert(out(400L) == c(1))
    assert(out(300L) == c(3) + c(3))
  }

  test("perSystemK truncates deep list tails before fusion") {
    val (a, b) = lists
    val out = Fusion.rrf(Seq(a, b), "query_id", "doc_id", "rank",
        perSystemK = 2).collect()
    assert(!out.map(_.getLong(2)).contains(300L), "rank-3 rows leaked past perSystemK=2")
  }

  test("single-system fusion preserves the input order") {
    val (a, _) = lists
    val out = Fusion.rrf(Seq(a), "query_id", "doc_id", "rank")
      .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(out == Seq(100L, 200L, 300L))
  }

  test("ties on fused score break deterministically by doc id") {
    val sp = spark; import sp.implicits._
    val a = Seq((1L, 9L, 1), (1L, 5L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 5L, 1), (1L, 9L, 2)).toDF("query_id", "doc_id", "rank")
    val out = Fusion.rrf(Seq(a, b), "query_id", "doc_id", "rank")
      .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(out == Seq(5L, 9L), s"tie not broken by doc id asc: $out")
  }
}
