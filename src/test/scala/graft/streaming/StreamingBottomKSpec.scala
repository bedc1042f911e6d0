package graft.streaming

import graft.SparkSpec
import graft.ops.BottomK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingBottomKSpec extends SparkSpec {

  test("scalar bk hash is value-identical to the Column ordering key") {
    val sp = spark; import sp.implicits._
    val ids = Seq(0L, 1L, 7L, 123456789L, Long.MaxValue)
    val colBk = ids.toDF("id")
      .select(col("id"), conv(substring(md5(concat(col("id").cast("string"),
        lit(BottomK.Salt))), 1, 15), 16, 10).cast("long").as("bk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(StreamingBottomK.bkHash(id) == colBk(id), s"kernel divergence at $id")
    }
  }

  test("streamed sample == batch sample of the same rows, across micro-batches") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    val all = (0 until 3000).map(i => StreamingBottomK.Item(i.toLong, i.toLong * 3))
    val mem = MemoryStream[StreamingBottomK.Item]
    val q = StreamingBottomK.shardSamples(mem.toDS(), shards = 4, k = 64)
      .writeStream.format("memory").queryName("sbk_out").outputMode("update").start()
    mem.addData(all.take(1000): _*)
    q.processAllAvailable()
    mem.addData(all.drop(1000): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = StreamingBottomK.mergeSample(sp.table("sbk_out"), k = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val batch = BottomK.sample(all.toDF("id", "v"), "id", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSet == batch.toSet,
      s"streaming/batch sample diverged: ${streamed.toSet diff batch.toSet} / ${batch.toSet diff streamed.toSet}")
    assert(streamed.length == 64)
  }

  test("late arrivals displace larger keys exactly as a batch over the union would") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    val mem = MemoryStream[StreamingBottomK.Item]
    val q = StreamingBottomK.shardSamples(mem.toDS(), shards = 2, k = 8)
      .writeStream.format("memory").queryName("sbk_late").outputMode("update").start()
    // batch 1: sparse tail ids; batch 2: dense head ids that hash lower on average
    mem.addData((2000L until 2100L).map(i => StreamingBottomK.Item(i, i)): _*)
    q.processAllAvailable()
    mem.addData((0L until 100L).map(i => StreamingBottomK.Item(i, i)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = StreamingBottomK.mergeSample(sp.table("sbk_late"), k = 8)
      .collect().map(_.getLong(1)).toSet
    val batch = BottomK.sample(
      ((2000L until 2100L) ++ (0L until 100L)).toDF("id"), "id", 8)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch, s"$streamed vs $batch")
  }
}
