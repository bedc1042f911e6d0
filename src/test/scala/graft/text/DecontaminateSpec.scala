package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C3's df-pruned inverted-index join: the boilerplate shingle shared by
  * every doc must be pruned from the index (it carries no contamination
  * signal and its join fan-out is f_train·f_test), while rare shared
  * shingles still flag true contamination. */
class DecontaminateSpec extends SparkSpec {

  // 12 docs sharing one boilerplate 3-gram ("all rights reserved",
  // df=12); docs 0 and 10 also share the rare "the stolen answer"
  // (df=2); every other trigram is per-doc unique (doc-id-salted
  // neighbors). id >= 10 → test split. df distribution: 36×1, 2, 12 —
  // percentile(df, 0.98) = 4.6, so pruning drops exactly the boilerplate.
  private def corpus = {
    val sp = spark; import sp.implicits._
    val boiler = "all rights reserved"
    (0 until 12).map { i =>
      val tail = if (i == 0 || i == 10) s"x$i the stolen answer" else s"b$i c$i d$i"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
  }

  test("hot boilerplate shingle is pruned; rare shared shingle survives") {
    val out = Decontaminate.overlaps(corpus, "doc_id", "text", 3,
        trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10,
        dfQuantile = 0.98)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only doc 0 overlaps the test split once the boilerplate is pruned
    assert(out == Map(0L -> 1L), s"got $out")
  }

  test("dfQuantile = 1.0 disables pruning: every train doc is flagged") {
    val out = Decontaminate.overlaps(corpus, "doc_id", "text", 3,
        trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10,
        dfQuantile = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == (0L until 10L).toSet, s"got $out")
    // boilerplate-only docs share exactly the boilerplate shingle;
    // the contaminated doc additionally shares the stolen answer
    assert(out(5L) == 1)
    assert(out(0L) == 2)
  }

  test("bloom prefilter is transparent: overlapsBloom equals unpruned overlaps") {
    val exact = Decontaminate.overlaps(corpus, "doc_id", "text", 3,
        trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10,
        dfQuantile = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Decontaminate.overlapsBloom(corpus, "doc_id", "text", 3,
        trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
  }

  test("composed defenses: bloom + df-pruning equals pruned overlaps") {
    val pruned = Decontaminate.overlaps(corpus, "doc_id", "text", 3,
        trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10,
        dfQuantile = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val composed = Decontaminate.overlapsBloom(corpus, "doc_id", "text", 3,
        trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10,
        dfQuantile = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(composed == pruned, s"composed=$composed pruned=$pruned")
  }

  test("bloom plan: state arrives as a scalar subquery, probed in a pre-shuffle Filter") {
    val df = Decontaminate.overlapsBloom(corpus, "doc_id", "text", 3,
      trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10)
    val physical = df.queryExecution.executedPlan.toString()
    // the state is inlined as a runtime constant (subquery), never a join
    // column: reading a binary column from an UnsafeRow copies it, so a
    // join-shaped state would memcpy the full filter per probed row
    assert(physical.contains("Subquery") && physical.contains("bloom_contains"),
      s"bloom probe not in scalar-subquery form:\n$physical")
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      s"state must not flow through a join:\n$physical")
  }

  test("pruned plan: broadcast ANTI join against the eagerly-built hot set") {
    val sp = spark
    val cachedBefore = sp.sparkContext.getPersistentRDDs.size
    val df = Decontaminate.overlaps(corpus, "doc_id", "text", 3,
      trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10)
    val physical = df.queryExecution.executedPlan.toString()
    // the hot set prunes map-side: a broadcast LeftAnti, never a shuffle
    // of the shingle frame against a keep set
    assert(physical.contains("BroadcastHashJoin") && physical.contains("LeftAnti"),
      s"hot set not a broadcast anti join:\n$physical")
    // the quantile + hot-set derivation ran EAGERLY (inside the
    // localCheckpoint that let the df aggregate be released before
    // overlaps returned — the r04 long-session leak fix), so the result
    // plan's anti-join build side is the materialized checkpoint, not a
    // live percentile aggregation
    assert(!physical.contains("percentile("),
      s"df aggregation leaked into the lazy result plan:\n$physical")
    assert(physical.contains("ExistingRDD") || physical.contains("LogicalRDD"),
      s"hot set not checkpoint-materialized:\n$physical")
    // only shh (the shared shingle cache, caller-owned) plus the tiny hot
    // checkpoint may remain persisted — the df aggregate must be gone
    val leaked = sp.sparkContext.getPersistentRDDs.size - cachedBefore
    assert(leaked <= 2, s"expected ≤2 new persisted RDDs (shh + hot), got $leaked")
  }

  test("novelty: every train doc scored; ppm is exact integer division") {
    val out = Decontaminate.noveltyScores(corpus, "doc_id", "text", 3,
        trainPred = col("doc_id") < 10, testPred = col("doc_id") >= 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == (0L until 10L).toSet, s"missing train docs: $out")
    // doc 5's only shingle shared with the reference split is the
    // boilerplate trigram "all rights reserved"
    val (n5, seen5, ppm5) = out(5L)
    assert(seen5 == 1, s"doc5: $n5 $seen5 $ppm5")
    assert(ppm5 == seen5 * 1000000L / n5, s"ppm not exact integer division: $ppm5")
    // doc 0 additionally contains the stolen answer → strictly higher overlap
    val (n0, seen0, _) = out(0L)
    assert(seen0 > seen5, s"doc0 $seen0 vs doc5 $seen5 (n0=$n0)")
  }
}
