package graft.streaming

import graft.SparkSpec
import graft.text.Bm25
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin #7: a BM25 serving index maintained from a document
  * stream must equal the batch rebuild over everything streamed —
  * exactly, scores included — and re-delivered batches must be no-ops
  * (the idempotence restarts rely on). */
object StreamingIndexMaintenanceSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingIndexMaintenanceSpec extends SparkSpec {
  import StreamingIndexMaintenanceSpec.Doc

  private val wave1 = Seq(
    Doc(1L, "quick brown fox jumps over lazy dog"),
    Doc(2L, "spark shuffles partition data across executors"))
  private val wave2 = Seq(
    Doc(3L, "quick brown fox jumps over sleepy dog"),
    Doc(4L, "entirely unrelated cooking recipe with butter and flour"))
  private val wave3 = Seq(
    Doc(5L, "the fox appears once here among other words"))

  test("streamed index after 3 micro-batches == batch rebuild, scores included") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val mem = MemoryStream[Doc]
    val sink = StreamingIndexMaintenance.indexSink(sp, dir, "doc_id", "text") _
    val q = mem.toDS().writeStream
      .foreachBatch((ds: org.apache.spark.sql.Dataset[Doc], id: Long) =>
        sink(ds.toDF(), id))
      .outputMode("append").start()
    for (w <- Seq(wave1, wave2, wave3)) {
      mem.addData(w: _*); q.processAllAvailable()
    }
    q.stop()
    assert(StreamingIndexMaintenance.latestVersion(dir) == 2L)
    val all = (wave1 ++ wave2 ++ wave3).toDF()
    val probes = all.filter(col("doc_id") === 1)
    val served = Bm25.searchIndex(probes,
        StreamingIndexMaintenance.readLatest(sp, dir), "doc_id", "text", k = 5,
        minIdfMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val rebuilt = Bm25.topK(probes, all, "doc_id", "text", k = 5,
        minIdfMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(served == rebuilt, s"streamed index diverged:\n$served\nvs\n$rebuilt")
    assert(served.nonEmpty)
  }

  test("pruneVersions retires old versions, keeps the serving pair, tolerates stragglers") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx3").toString
    val sink = StreamingIndexMaintenance.indexSink(sp, dir, "doc_id", "text") _
    sink(wave1.toDF(), 0L); sink(wave2.toDF(), 1L); sink(wave3.toDF(), 2L)
    // a partially-written straggler (no marker) below the keep window
    new java.io.File(s"$dir/v0_tmp").mkdirs() // non-matching name: ignored
    StreamingIndexMaintenance.pruneVersions(dir, keep = 2)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.contains("v0"), names)
    assert(names.contains("v1") && names.contains("v2"), names)
    assert(StreamingIndexMaintenance.latestVersion(dir) == 2L)
    // the served search still works from the kept latest
    val served = Bm25.searchIndex((wave1 ++ wave2 ++ wave3).toDF()
        .filter(col("doc_id") === 1),
      StreamingIndexMaintenance.readLatest(sp, dir), "doc_id", "text", k = 3,
      minIdfMicro = 0L)
    assert(served.count() > 0)
  }

  test("a re-delivered batch id is a no-op (restart idempotence)") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx2").toString
    val sink = StreamingIndexMaintenance.indexSink(sp, dir, "doc_id", "text") _
    sink(wave1.toDF(), 0L)
    sink(wave2.toDF(), 1L)
    val before = Bm25.readIndex(sp, s"$dir/v1").stats.collect().toSeq
    // crash-replay: batch 1 delivered again — must not double-count
    sink(wave2.toDF(), 1L)
    assert(StreamingIndexMaintenance.latestVersion(dir) == 1L)
    val after = Bm25.readIndex(sp, s"$dir/v1").stats.collect().toSeq
    assert(after == before, s"re-delivery changed the index: $after vs $before")
    assert(after.head.getLong(0) == 4L) // 4 docs, not 6
  }
}
