package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BottomKSpec extends SparkSpec {

  private def rows(n: Int) = {
    val sp = spark; import sp.implicits._
    // value == id: true quantiles are known in closed form
    (0 until n).map(i => (i.toLong, i.toLong)).toDF("id", "v")
  }

  test("sample is a function of the set: partitioning cannot change it") {
    val df = rows(5000)
    val a = BottomK.sample(df.repartition(1), "id", 64)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = BottomK.sample(df.repartition(13, col("v")), "id", 64)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample changed under repartitioning")
    assert(a.size == 64)
  }

  test("quantile estimates land within the O(1/sqrt(k)) rank envelope") {
    val out = BottomK.quantileEstimates(rows(20000), "id", "v", k = 1024)
      .collect().head
    assert(out.getLong(0) == 1024)
    val (p50, p90, p99) = (out.getDouble(1), out.getDouble(2), out.getDouble(3))
    // true p50=10000, p90=18000, p99=19800; 1/sqrt(1024) ≈ 3.1% ranks →
    // allow 4 sigma ≈ 12.5% rank error = 2500 value units
    assert(math.abs(p50 - 10000) < 2500, s"p50=$p50")
    assert(math.abs(p90 - 18000) < 2500, s"p90=$p90")
    assert(math.abs(p99 - 19800) < 2500, s"p99=$p99")
  }

  test("corpus smaller than k: the sample IS the corpus, estimates exact") {
    val out = BottomK.quantileEstimates(rows(101), "id", "v", k = 1024)
      .collect().head
    assert(out.getLong(0) == 101)
    assert(out.getDouble(1) == 50.0) // exact median of 0..100
    assert(out.getLong(4) == 0L && out.getLong(5) == 100L)
  }
}
