package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned range join matches the naive cross-join filter") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 1000))
      .toDF("pid", "p")
    // overlapping intervals of varied widths, including boundary-aligned
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 900
      (i.toLong, lo, lo + (if (i % 4 == 0) 250.0 else rnd.nextDouble() * 60))
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth = 50.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val expected = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("the plan is an equi-join on the bin key, not a nested loop") {
    val sp = spark; import sp.implicits._
    val points = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "p")
    val intervals = Seq((1L, 0.0, 50.0), (2L, 50.0, 120.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("boundary semantics: lo inclusive, hi exclusive, exact bin edges") {
    val sp = spark; import sp.implicits._
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, 19.999)).toDF("pid", "p")
    val intervals = Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L)) // 20.0 is excluded (hi), 10.0 included (lo)
  }
}
