package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {

  test("overlapping and touching intervals merge; gapped ones do not") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("k", 1, 5), ("k", 4, 8), ("k", 8, 9), // chain via overlap + touch
      ("k", 11, 12),                          // gap of 1 → own island
      ("j", 1, 2), ("j", 2, 3))               // other key, touching
      .toDF("key", "s", "e")
    val out = Intervals.coalesce(df, Seq("key"), "s", "e")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(out == Set(("k", 1, 9, 3L), ("k", 11, 12, 1L), ("j", 1, 3, 2L)), out.toString)
  }

  test("containment: an interval inside another does not split the island") {
    val sp = spark; import sp.implicits._
    val df = Seq(("k", 1, 20), ("k", 2, 3), ("k", 5, 6), ("k", 25, 26))
      .toDF("key", "s", "e")
    val out = Intervals.coalesce(df, Seq("key"), "s", "e")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(out == Set((1, 20, 3L), (25, 26, 1L)), out.toString)
  }

  test("duplicate intervals with a total tie-break order merge deterministically") {
    val sp = spark; import sp.implicits._
    val df = (0 until 50).map(i => ("k", i.toLong, 10, 12)).toDF("key", "id", "s", "e")
    val out = Intervals.coalesce(df, Seq("key"), "s", "e", tieBreakCols = Seq("id"))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq((10, 12, 50L)), out.toSeq.toString)
  }
}
