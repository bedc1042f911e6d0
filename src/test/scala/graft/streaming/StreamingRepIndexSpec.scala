package graft.streaming

import graft.SparkSpec
import graft.dedup.{MinHash, RepIndex}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin #10: the representative-only serving index maintained
  * from a document stream must equal the batch build/append path state
  * EXACTLY — labels, live rep set, band rows — with O(delta) segments
  * (write-volume pinned), monotone rep retirement across waves,
  * re-delivery idempotence, and compaction-resolved reads. */
object StreamingRepIndexSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingRepIndexSpec extends SparkSpec {
  import StreamingRepIndexSpec.Doc

  private val groupA = "alpha beta gamma delta epsilon zeta eta theta"
  private val groupB = "one two three four five six seven eight nine"
  private val loner  = "completely unrelated text about parquet file formats"
  private val novelT = "fresh never before seen tokens entirely new cluster"

  // wave 2's doc 1 merges into group A under a NEW minimum (rep 5
  // retires); wave 3's doc 0 takes the minimum again (rep 1 retires)
  private val wave1 = Seq(Doc(5L, groupA), Doc(7L, groupA), Doc(9L, groupB))
  private val wave2 = Seq(Doc(1L, groupA), Doc(3L, novelT))
  private val wave3 = Seq(Doc(0L, groupA), Doc(2L, groupB))

  private def labelMap(st: RepIndex.State): Map[Long, Long] =
    st.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def repIds(st: RepIndex.State): Set[Long] =
    st.sharr.collect().map(_.getLong(0)).toSet

  test("3 streamed waves == the batch build/append path, retirement included") {
    val sp = spark; import sp.implicits._
    implicit val sc = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_srep").toString
    val mem = MemoryStream[Doc]
    val sink = StreamingRepIndexMaintenance.sink(sp, dir, "doc_id", "text") _
    val q = mem.toDS().writeStream
      .foreachBatch((ds: org.apache.spark.sql.Dataset[Doc], id: Long) =>
        sink(ds.toDF(), id))
      .outputMode("append").start()
    for (w <- Seq(wave1, wave2, wave3)) { mem.addData(w: _*); q.processAllAvailable() }
    q.stop()
    assert(StreamingRepIndexMaintenance.latestMaxBatch(dir) == 2L)
    val got = StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id")
    // the batch path over the same waves
    def sharrOf(rows: Seq[Doc]) =
      MinHash.hashedShingleArray(rows.toDF(), "doc_id", "text", 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val want = RepIndex.append(sharrOf(wave3),
      RepIndex.append(sharrOf(wave2), RepIndex.build(sharrOf(wave1), "doc_id"),
        "doc_id"), "doc_id")
    assert(labelMap(got) == labelMap(want), s"${labelMap(got)} vs ${labelMap(want)}")
    // group A collapsed to min 0 through two rep retirements (5, then 1)
    assert(labelMap(got)(7L) == 0L && labelMap(got)(5L) == 0L
      && labelMap(got)(1L) == 0L)
    assert(repIds(got) == repIds(want))
    assert(repIds(got) == Set(0L, 2L, 3L)) // reps: A→0, B→2, novel 3... and loner? none here
    // band rows identical too
    val gb = got.bands.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val wb = want.bands.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gb == wb)
    // O(delta) write volume: wave 2's segment carries only the changed
    // labels (1, 3 new; 5, 7 re-rooted to 1) and only the new reps (1, 3)
    val seg1Labels = sp.read.parquet(s"$dir/seg1/labels")
      .collect().map(r => r.getLong(0)).toSet
    assert(seg1Labels == Set(1L, 3L, 5L, 7L), seg1Labels)
    val seg1Reps = sp.read.parquet(s"$dir/seg1/sharr")
      .collect().map(_.getLong(0)).toSet
    assert(seg1Reps == Set(1L, 3L), seg1Reps)
    val seg1Retired = sp.read.parquet(s"$dir/seg1/retired")
      .collect().map(_.getLong(0)).toSet
    assert(seg1Retired == Set(5L), seg1Retired)
    // re-delivery is a no-op
    sink(wave3.toDF(), 2L)
    assert(StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id")
      .labels.count() == want.labels.count())
    // serving search from the streamed state finds the current rep
    val hits = RepIndex.search(sharrOf(Seq(Doc(100L, groupA))), got, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((100L, 0L)), hits.toString)
    // cold member store (delete-time promotion source) matches the batch
    // path id-for-id: batch non-reps + retired reps, never a current rep
    assert(got.marr.collect().map(_.getLong(0)).toSet ==
      want.marr.collect().map(_.getLong(0)).toSet)
    // a batch delete over the STREAMED state promotes from that store:
    // tombstoning rep 0 re-roots group A at 1 (array recovered from marr)
    val del = RepIndex.delete(Seq(0L).map(Tuple1(_)).toDF("doc_id"),
      StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id"), "doc_id")
    assert(labelMap(del)(1L) == 1L && labelMap(del)(5L) == 1L
      && labelMap(del)(7L) == 1L)
    val hits2 = RepIndex.search(sharrOf(Seq(Doc(101L, groupA))), del, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits2 == Set((101L, 1L)), hits2.toString)

    // the IN-PROTOCOL delete: commits the re-rooted state as a full
    // compaction (min-merge would resurrect the deleted root from old
    // label segments otherwise), serves the promoted rep, no-ops on
    // re-delivery, and keeps accepting appends afterwards
    StreamingRepIndexMaintenance.deleteSink(sp, dir, "doc_id")(
      Seq(0L).map(Tuple1(_)).toDF("doc_id"), 3L)
    assert(Segments.latest(dir).get.segments == Seq("cmp3"))
    val got2 = StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id")
    assert(labelMap(got2) == labelMap(del))
    val hits3 = RepIndex.search(sharrOf(Seq(Doc(102L, groupA))), got2, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits3 == Set((102L, 1L)), hits3.toString)
    StreamingRepIndexMaintenance.deleteSink(sp, dir, "doc_id")(
      Seq(1L).map(Tuple1(_)).toDF("doc_id"), 3L) // re-delivery: skipped
    assert(labelMap(StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id"))
      == labelMap(del))
    // appends continue after the delete; the deleted id may return (its
    // tombstone is resolved — the state simply no longer contains it)
    sink(Seq(Doc(0L, groupA)).toDF(), 4L)
    val got3 = StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id")
    assert(labelMap(got3)(0L) == 0L && labelMap(got3)(1L) == 0L,
      labelMap(got3).toString) // 0 re-enters and re-takes the min root
  }

  test("compaction resolves tombstones and keeps the state identical") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_srep_c").toString
    val sink = StreamingRepIndexMaintenance
      .sink(sp, dir, "doc_id", "text", maxSegments = 2) _
    sink(wave1.toDF(), 0L); sink(wave2.toDF(), 1L); sink(wave3.toDF(), 2L)
    assert(Segments.latest(dir).get.segments == Seq("cmp2"))
    assert(StreamingRepIndexMaintenance.latestMaxBatch(dir) == 2L)
    val got = StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id")
    assert(repIds(got) == Set(0L, 2L, 3L))
    assert(labelMap(got)(9L) == 2L) // wave-1 node re-rooted by wave 3, resolved
    // compacted tombstones are empty; retired reps are gone from the rows
    assert(sp.read.parquet(s"$dir/cmp2/retired").count() == 0)
    assert(sp.read.parquet(s"$dir/cmp2/sharr")
      .collect().map(_.getLong(0)).toSet == Set(0L, 2L, 3L))
    // folding after compaction still works
    sink(Seq(Doc(50L, loner)).toDF(), 3L)
    val got2 = StreamingRepIndexMaintenance.readLatest(sp, dir, "doc_id")
    assert(repIds(got2) == Set(0L, 2L, 3L, 50L))
  }
}
