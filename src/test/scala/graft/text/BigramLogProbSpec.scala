package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interpolated bigram cross-entropy: hand-derived values, unigram
  * fallback for single-token docs, and the word-order sensitivity that
  * distinguishes it from the unigram filter. */
class BigramLogProbSpec extends SparkSpec {

  private def micro(logp: Double): Long =
    BigDecimal(logp * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  private def xentOf(sumMicro: Long, n: Long): Double =
    ((2 * sumMicro + n) / (2 * n)).toDouble / 1000000

  test("hand-computed interpolated transition scores") {
    val sp = spark; import sp.implicits._
    // all-train: transitions (a,b)x2 (b,a)x2 over two docs
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text",
        trainBucketBelow = 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // LM: c2(a,b)=2, c2(b,a)=2; c1(a)=2, c1(b)=2; cu(a)=2, cu(b)=2;
    // tot=4, v=2. Both transitions: blend = (700*3*7 + 300*3*5)/(1000*5*7)
    val lm = micro(math.log((700.0 * 3 * 7 + 300.0 * 3 * 5) / (1000.0 * 5 * 7)))
    assert(out(0) == ((1L, 3L, xentOf(-3 * lm, 3))), out(0).toString)
    assert(out(1) == ((2L, 1L, xentOf(-lm, 1))), out(1).toString)
  }

  test("single-token docs fall back to the unigram score") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "solo")).toDF("doc_id", "text")
    val bi = TextAnalysis.bigramLogProb(docs, "doc_id", "text",
        trainBucketBelow = 100)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val uni = TextAnalysis.unigramLogProb(docs, "doc_id", "text",
        trainBucketBelow = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bi(2L)._1 == 0L, "no transitions in a one-token doc")
    assert(bi(2L)._2 == uni(2L), "fallback must be the unigram score")
    assert(bi(1L)._1 == 2L)
  }

  test("word order matters: scrambled text scores worse than fluent text") {
    val sp = spark; import sp.implicits._
    // the LM is dominated by the fluent order; the scrambled doc uses the
    // SAME words (identical unigram stats) in unseen transitions
    val fluent = (1L to 30L).map(i => (i, "the cat sat on the mat"))
    val probes = Seq((100L, "the cat sat on the mat"),
      (101L, "mat the on sat cat the"))
    val docs = (fluent ++ probes).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text",
        trainBucketBelow = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(101L) > out(100L),
      s"scrambled ${out(101L)} must score above fluent ${out(100L)}")
    // and the unigram filter CANNOT see the difference
    val uni = TextAnalysis.unigramLogProb(docs, "doc_id", "text",
        trainBucketBelow = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(uni(100L) == uni(101L))
  }
}
