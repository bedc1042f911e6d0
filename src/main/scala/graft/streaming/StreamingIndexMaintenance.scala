package graft.streaming

import graft.text.Bm25
import org.apache.spark.sql.{DataFrame, SparkSession}

/** STREAMING serving-index maintenance — the round-9 append trio
  * (BM25 r4 / IVF x18 / LSH d15) driven from a stream: each micro-batch
  * of finalized documents folds into a VERSIONED stored BM25 index via
  * `foreachBatch` + [[Bm25.appendToIndex]], so the serving tier always
  * has a complete index at vN while vN+1 builds — and because every
  * index component merge is associative and exact, the index after N
  * batches equals `buildIndex` over everything streamed so far,
  * bit-for-bit (spec-pinned, including a processing-time-only
  * restart-safety note below).
  *
  * Versioned directories (v0, v1, …) rather than in-place overwrite:
  * parquet cannot be rewritten while a reader holds it, and a crashed
  * write must not corrupt the serving version — `latestVersion` only
  * advances once the new version is fully written (the `_v` marker is
  * written LAST). Exactly-once across restarts comes from pairing the
  * version number with the checkpoint's batchId: re-delivery of batch k
  * finds `v{k+1}` already marked and skips the merge (idempotent). */
object StreamingIndexMaintenance {

  private def marker(dir: String, v: Long) =
    new java.io.File(s"$dir/v$v/_v")

  /** Highest fully-written version in `dir`, or -1 if none. Only
    * `v<digits>` entries count — stray directories in the index root
    * (tooling artifacts, a user "vacuum/" folder) must not brick the
    * serving scan. */
  def latestVersion(dir: String): Long = {
    val d = new java.io.File(dir)
    val vs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .filter(v => marker(dir, v).exists())
    if (vs.isEmpty) -1L else vs.max
  }

  def readLatest(spark: SparkSession, dir: String): Bm25.Index =
    Bm25.readIndex(spark, s"$dir/v${latestVersion(dir)}")

  /** Retire versions older than the newest `keep` fully-written ones —
    * the GC a long-running maintenance stream needs (every micro-batch
    * writes a full index version; without pruning the directory grows
    * without bound). Serving safety: the newest `keep` versions are
    * untouched, and an unmarked (partially-written) version is removed
    * only if a NEWER marked version exists — a writer mid-flight on the
    * next version is never raced. Run with keep ≥ 2 so a reader that
    * resolved `latestVersion` just before a new write still has its
    * version on disk through the swap. */
  def pruneVersions(dir: String, keep: Int = 2): Unit = {
    require(keep >= 1)
    val d = new java.io.File(dir)
    val all = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(f => f.getName.drop(1).toLong).sorted
    val marked = all.filter(v => marker(dir, v).exists())
    if (marked.isEmpty) return
    val keepFrom = marked.takeRight(keep).head
    all.filter(v => v < keepFrom).foreach { v =>
      val dv = new java.io.File(s"$dir/v$v")
      // delete the marker FIRST: a crash mid-delete leaves an unmarked
      // (= invisible) version, never a marked-but-partial one
      marker(dir, v).delete()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(dv)
    }
  }

  /** The foreachBatch function: fold `batch` into the latest stored
    * version, writing version `batchId` (idempotent on re-delivery —
    * a marked v{batchId} is left untouched). Wire it as
    * `ds.writeStream.foreachBatch(indexSink(spark, dir, "doc_id", "text") _)`. */
  def indexSink(spark: SparkSession, dir: String, idCol: String,
                textCol: String)(batch: DataFrame, batchId: Long): Unit = {
    if (marker(dir, batchId).exists()) return // re-delivered: already folded
    val prev = latestVersion(dir)
    // keep the handle to the batch index: its postings frame is the one
    // buildIndex persisted, and a long-running stream must release it
    // per micro-batch (unpersisting the merged UNION plan would be a
    // no-op — it was never cached)
    val bIdx = Bm25.buildIndex(batch, idCol, textCol)
    val merged =
      if (prev < 0) bIdx
      else Bm25.appendIndexes(bIdx, Bm25.readIndex(spark, s"$dir/v$prev"))
    Bm25.writeIndex(merged, s"$dir/v$batchId")
    bIdx.postings.unpersist()
    val m = marker(dir, batchId)
    m.getParentFile.mkdirs()
    java.nio.file.Files.createFile(m.toPath)
  }
}
