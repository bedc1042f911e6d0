package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WhitenSpec extends SparkSpec {

  // dim 0: spread; dim 1: different scale; dim 2: CONSTANT (σ=0)
  private def frame = {
    val sp = spark; import sp.implicits._
    Seq(
      1L -> Array(1.0f, 10.0f, 7.0f),
      2L -> Array(2.0f, 30.0f, 7.0f),
      3L -> Array(3.0f, 50.0f, 7.0f),
      4L -> Array(4.0f, 70.0f, 7.0f))
      .toDF("vec_id", "embedding")
  }

  private def stats(white: org.apache.spark.sql.DataFrame) = white
    .select(posexplode(col("white")).as(Seq("pos", "z")))
    .groupBy(col("pos"))
    .agg(avg(col("z")).as("m"), stddev_pop(col("z")).as("s"))
    .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

  test("whitened dims have zero mean / unit sd; constant dims map to 0") {
    for (sorted <- Seq(false, true)) {
      val st = stats(Cosine.whiten(frame, "vec_id", "embedding", sorted))
      for (d <- Seq(0, 1)) {
        assert(math.abs(st(d)._1) < 1e-9, s"dim $d mean ${st(d)._1} (sorted=$sorted)")
        assert(math.abs(st(d)._2 - 1.0) < 1e-9, s"dim $d sd ${st(d)._2} (sorted=$sorted)")
      }
      assert(st(2) == ((0.0, 0.0)), s"constant dim not zeroed: ${st(2)} (sorted=$sorted)")
    }
  }

  test("plain and sorted stats paths whiten identically within tolerance") {
    val a = Cosine.whiten(frame, "vec_id", "embedding", sorted = false)
      .select(col("vec_id"), posexplode(col("white")).as(Seq("pos", "z")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = Cosine.whiten(frame, "vec_id", "embedding", sorted = true)
      .select(col("vec_id"), posexplode(col("white")).as(Seq("pos", "z")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"$k: $v vs ${b(k)}") }
  }
}
