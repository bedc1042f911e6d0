package graft.plans

import graft.SparkSpec
import graft.similarity.Cosine
import org.apache.spark.sql.functions._

/** [[MomentSumAgg]] — the buffer-summing second-moment trainer pass that
  * replaced moment2Rotation's posexplode (dim²+1 Catalyst rows PER
  * DOCUMENT map-side). Pins: bit-level value identity against the
  * declarative formulation it replaced ON THE REAL CORPUS across a
  * multi-partition layout (merge path exercised), null-row/null-element
  * policy, mixed-width loudness, and the two fail-fast scale gates the
  * ADVICE asked for (MaxRotationDim, rotatedPrefix literal budget). */
class MomentSumAggSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("momentSum == the posexplode formulation on the embeddings corpus") {
    val emb = graft.Tables.embeddings(spark, sfDir).repartition(7)
    val v = Cosine.toDouble(col("embedding"))
    val got = emb.select(MomentSumAgg.momentSum(v).as("m"))
      .head().getSeq[Double](0)
    val want = emb
      .select(posexplode(concat(array(lit(1.0d)), flatten(transform(v,
        x => transform(v, y => x * y))))).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    assert(got.head == emb.count().toDouble)
    // same sums up to summation-order rounding (both sides combine
    // partials in partition order; neither order is canonical)
    got.indices.foreach { i =>
      val w = want(i)
      assert(math.abs(got(i) - w) <= 1e-9 * math.max(1.0, math.abs(w)),
        s"slot $i: ${got(i)} vs $w")
    }
  }

  test("null rows are skipped; a null ELEMENT is loud; widths must agree") {
    val sp = spark; import sp.implicits._
    val withNullRow = Seq(
      (1, Some(Seq(1.0, 2.0))),
      (2, None),
      (3, Some(Seq(3.0, 4.0)))).toDF("id", "v")
    val m = withNullRow
      .select(MomentSumAgg.momentSum(col("v")).as("m")).head().getSeq[Double](0)
    // count 2; sums over the two non-null rows
    assert(m == Seq(2.0, 1.0 * 1 + 3 * 3, 1.0 * 2 + 3 * 4, 2.0 * 1 + 4 * 3,
      2.0 * 2 + 4 * 4))
    val withNullElem = Seq((1, Seq(Some(1.0), None))).toDF("id", "v")
    val e = intercept[Exception] {
      withNullElem.select(MomentSumAgg.momentSum(col("v"))).head()
    }
    assert(e.getMessage.contains("dense"), e.getMessage)
    val mixed = Seq((1, Seq(1.0, 2.0)), (2, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val e2 = intercept[Exception] {
      // single partition so both widths reach ONE buffer in update()
      mixed.coalesce(1).select(MomentSumAgg.momentSum(col("v"))).head()
    }
    assert(e2.getMessage.contains("mixed vector widths"), e2.getMessage)
  }

  test("empty input evals to an empty array and moment2Rotation to Nil") {
    val sp = spark; import sp.implicits._
    val none = Seq.empty[(Int, Seq[Double])].toDF("id", "v")
    assert(none.select(MomentSumAgg.momentSum(col("v")))
      .head().getSeq[Double](0).isEmpty)
    assert(Cosine.moment2Rotation(none, "v", p = 4).isEmpty)
  }

  test("moment2Rotation fails fast past MaxRotationDim; rotatedPrefix gates p·dim") {
    val sp = spark; import sp.implicits._
    val wide = Seq((1, Seq.fill(Cosine.MaxRotationDim + 1)(0.5)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Cosine.moment2Rotation(wide, "v", p = 4)
    }
    assert(e.getMessage.contains("MaxRotationDim"), e.getMessage)
    // the literal-node budget: a (p=256, dim=1024) rotation is 2^18 nodes
    val hugeRot = Seq.fill(256)(Seq.fill(1024)(0.0))
    val e2 = intercept[IllegalArgumentException] {
      Cosine.rotatedPrefix(col("v"), hugeRot)
    }
    assert(e2.getMessage.contains("literal nodes"), e2.getMessage)
  }
}
