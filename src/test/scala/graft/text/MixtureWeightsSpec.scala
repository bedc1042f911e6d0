package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Alpha-sampling corpus mixing: hand-checked factors, multiplicity
  * realization, and the flattening direction (rare sources up, dominant
  * sources down). */
class MixtureWeightsSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("factors match the hand-derived alpha=0.5 reweighting") {
    val sp = spark; import sp.implicits._
    // source a: 4 docs x 4 tokens = 16; source b: 1 doc x 4 tokens = 4
    val docs = ((1L to 4L).map(i => (i, "a", "w x y z")) :+
      ((9L, "b", "w x y z"))).map { case (id, s, t) => (id, s, t) }
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.mixtureWeights(docs, "doc_id", "text", "source")
      .select(col("source"), col("factor")).distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wsum = math.sqrt(4.0) + math.sqrt(16.0) // sorted ascending
    val fA = round6((math.sqrt(16.0) / wsum) / (16.0 / 20))
    val fB = round6((math.sqrt(4.0) / wsum) / (4.0 / 20))
    assert(out == Map("a" -> fA, "b" -> fB), s"$out vs a=$fA b=$fB")
    // flattening direction: the dominant source is down-sampled, the
    // rare one up-sampled, and the factors bracket 1
    assert(fA < 1.0 && fB > 1.0)
  }

  test("multiplicity realizes the factor: floor/ceil values, mean near factor") {
    val sp = spark; import sp.implicits._
    // two sources, 1000 docs each, identical doc length -> factors are
    // ~0.94 / ~1.88-ish; multiplicities must be in {floor, floor+1} and
    // average to the factor within a few percent
    val docs = (1L to 2000L).map(i =>
      (i, if (i <= 1500) "big" else "small", "one two three four five"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.mixtureWeights(docs, "doc_id", "text", "source")
      .groupBy(col("source"))
      .agg(first(col("factor")).as("factor"),
        avg(col("multiplicity")).as("mean_mult"),
        min(col("multiplicity")).as("lo"), max(col("multiplicity")).as("hi"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    out.foreach { case (src, (factor, mean, lo, hi)) =>
      assert(lo == math.floor(factor).toLong && hi <= lo + 1,
        s"$src multiplicity outside {floor, floor+1}: $lo..$hi for $factor")
      assert(math.abs(mean - factor) < 0.05,
        s"$src mean multiplicity $mean far from factor $factor")
    }
  }

  test("alpha=1 is the identity mixture (every factor 1, every multiplicity 1)") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 100L).map(i =>
      (i, s"s${i % 7}", "alpha beta gamma")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.mixtureWeights(docs, "doc_id", "text", "source",
      alpha = 1.0)
    assert(out.filter(col("factor") =!= 1.0 || col("multiplicity") =!= 1L).count() == 0)
  }
}
