package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The CCNet-style unigram cross-entropy filter: hand-computed values,
  * OOV accounting against the train split, and the decimal-sum
  * determinism contract. */
class UnigramLogProbSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The engine's per-token representation: micro-nats as a long. */
  private def micro(logp: Double): Long =
    BigDecimal(logp * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** The engine's per-doc score: integer half-up of S/N micro-nats, then
    * one exact division — mirrors unigramLogProb's DIV formulation. */
  private def xentOf(sumMicro: Long, n: Long): Double =
    ((2 * sumMicro + n) / (2 * n)).toDouble / 1000000

  test("hand-computed cross-entropy on a tiny all-train corpus") {
    val sp = spark; import sp.implicits._
    // trainBucketBelow=100 -> every doc is train, so the LM is known
    // exactly: counts a:2 b:2 c:1, tot=5, V=3, denominator tot+V+1=9
    val docs = Seq((1L, "a A b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text",
        trainBucketBelow = 100)
      .orderBy("doc_id").collect()
    val lpA = micro(math.log(3.0 / 9)) // (2+1)/9 — lowercase folds A into a
    val lpB = micro(math.log(3.0 / 9))
    val lpC = micro(math.log(2.0 / 9))
    // per-doc sum is exact integer micro-nats; one final division
    val want1 = xentOf(-(2 * lpA + 1 * lpB), 3)
    val want2 = xentOf(-(lpB + lpC), 2)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 0L), (2L, 2L, 0L)))
    assert(out(0).getDouble(3) == want1, s"${out(0).getDouble(3)} != $want1")
    assert(out(1).getDouble(3) == want2, s"${out(1).getDouble(3)} != $want2")
  }

  test("tokens unseen in the train split count as OOV and score the OOV mass") {
    val sp = spark; import sp.implicits._
    // find real bucket assignments so the fixture exercises the genuine
    // t7 split instead of assuming which ids are train
    val ids = (1L to 200L).toDF("doc_id")
      .withColumn("bucket", TextAnalysis.splitBucket(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val heldOut = ids.collectFirst { case (id, b) if b >= 80 => id }.get
    val train = ids.collectFirst { case (id, b) if b < 80 => id }.get
    val docs = Seq((train, "common words common words"),
      (heldOut, "unseenword common")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(train)._2 == 0, "train doc has no OOV tokens")
    assert(out(heldOut)._1 == 2 && out(heldOut)._2 == 1,
      s"exactly 'unseenword' is OOV: ${out(heldOut)}")
    // LM: common:2 words:2, tot=4, V=2, denom=7
    val lpCommon = micro(math.log(3.0 / 7))
    val lpOov = micro(math.log(1.0 / 7))
    assert(out(heldOut)._3 == xentOf(-(lpOov + lpCommon), 2))
    // the unseen token is maximally improbable: held-out doc scores worse
    assert(out(heldOut)._3 > out(train)._3)
  }

  test("cross-entropy orders in-domain below out-of-domain text") {
    val sp = spark; import sp.implicits._
    // 20 fluent docs sharing a vocabulary + 1 doc of rare junk: the
    // filter must rank the junk doc strictly worst (highest xent)
    val fluent = (1L to 20L).map(i =>
      (i, "the model learns the common distribution of the corpus tokens"))
    val junk = Seq((99L, "zxqv wrtk pqnm bvcx jklh zxqv"))
    val docs = (fluent ++ junk).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text",
        trainBucketBelow = 100)
      .orderBy(desc("xent")).collect()
    assert(out.head.getLong(0) == 99L, s"junk must score worst: ${out.head}")
    assert(out.head.getDouble(3) > out(1).getDouble(3))
  }
}
