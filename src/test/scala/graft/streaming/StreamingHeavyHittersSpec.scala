package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingHeavyHittersSpec extends SparkSpec {

  test("streaming MG summaries carry heavy keys across micro-batches") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    val mem = MemoryStream[Long]
    val q = StreamingHeavyHitters.summaries(mem.toDS(), shards = 4, k = 8)
      .writeStream.format("memory").queryName("shh_out").outputMode("update").start()
    // batch 1: key 7 heavy, noise singletons
    mem.addData(Seq.fill(50)(7L) ++ (100L to 130L): _*)
    q.processAllAvailable()
    // batch 2: key 7 keeps arriving; key 9 becomes heavy
    mem.addData(Seq.fill(30)(7L) ++ Seq.fill(40)(9L) ++ (200L to 220L): _*)
    q.processAllAvailable()
    // latest row per (shard, h) — Update mode re-emits refreshed shards
    val latest = sp.sql(
      """SELECT h, max(cnt_lb) AS cnt FROM shh_out GROUP BY h""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(latest.contains(7L) && latest.contains(9L), s"heavy keys lost: $latest")
    assert(latest(7L) <= 80L && latest(9L) <= 40L, s"counter exceeds truth: $latest")
    // cross-batch accumulation actually happened (state, not per-batch count)
    assert(latest(7L) > 50L, s"state did not accumulate across batches: $latest")
  }

  test("streaming summaries agree with the batch operator's guarantee") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    val next = seededInts(13L)
    val keys = (1 to 600).map { _ =>
      val r = next(100)
      if (r < 30) 1L else if (r < 50) 2L else (1000 + next(300)).toLong
    }
    val mem = MemoryStream[Long]
    val q = StreamingHeavyHitters.summaries(mem.toDS(), shards = 4, k = 16)
      .writeStream.format("memory").queryName("shh_par").outputMode("update").start()
    keys.grouped(150).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val streamCand = sp.sql("SELECT DISTINCT h FROM shh_par")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    // batch MG over the same keys (k=16 per the whole corpus)
    val batchHeavy = keys.toDF("h")
      .agg(graft.plans.MisraGriesAgg.mgSummary(col("h"), 16)).head.getSeq[Row](0)
      .map(_.getLong(0)).toSet
    // the stream candidates must cover every key above n/(k+1) — here keys
    // 1 and 2 (~30% and ~20% of 600)
    assert(streamCand.contains(1L) && streamCand.contains(2L))
    assert(batchHeavy.contains(1L) && batchHeavy.contains(2L))
  }
}
