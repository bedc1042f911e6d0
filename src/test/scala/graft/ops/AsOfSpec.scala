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

  test("as-of join matches the naive per-key scan on random data") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i =>
      (s"u${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("user", "t", "lid")
    val rightRows = (1 to 150).map(i =>
      (s"u${rnd.nextInt(12)}", rnd.nextInt(1000).toLong, i * 1.0))
      .groupBy(r => (r._1, r._2)).map(_._2.last).toSeq // unique (key, ts)
    val right = rightRows.toDF("user", "rt", "price")
    val got = AsOf.asofJoin(left, right, Seq("user"), "t", "rt")
      .select("lid", "price").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("price")).map(_.toDouble))
      .toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = left.collect().map { r =>
      val (u, t, lid) = (r.getString(0), r.getLong(1), r.getLong(2))
      lid -> byKey.getOrElse(u, Seq.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == expected)
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
