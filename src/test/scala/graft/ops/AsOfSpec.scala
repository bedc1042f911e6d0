package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("as-of join picks the latest right row at or before each left ts") {
    val sp = spark; import sp.implicits._
    val left = Seq(("u1", 10L, "p1"), ("u1", 20L, "p2"), ("u1", 5L, "p0"),
      ("u2", 10L, "p3")).toDF("user", "t", "tag")
    val right = Seq(("u1", 8L, 1.0), ("u1", 10L, 2.0), ("u1", 15L, 3.0),
      ("u3", 1L, 9.0)).toDF("user", "rt", "price")
    val out = AsOf.asofJoin(left, right, Seq("user"), "t", "rt")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    assert(out("p0").isEmpty)          // nothing at or before t=5
    assert(out("p1").contains(2.0))    // inclusive: rt=10 matches t=10
    assert(out("p2").contains(3.0))    // latest of 8/10/15
    assert(out("p3").isEmpty)          // u2 has no right rows at all
  }

  test("as-of join window is keyed, never unpartitioned") {
    val sp = spark; import sp.implicits._
    val left = Seq(("u1", 10L, "x")).toDF("user", "t", "tag")
    val right = Seq(("u1", 8L, 1.0)).toDF("user", "rt", "price")
    val plan = AsOf.asofJoin(left, right, Seq("user"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [last") ||
      plan.contains("windowspecdefinition(user"), plan)
  }
}
