package graft.streaming

import graft.dedup.{MinHash, RepIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance for the REPRESENTATIVE-ONLY serving index
  * (twin #10 — the rep-index member of the streaming maintenance
  * family): each micro-batch of finalized documents folds into the
  * stored [[RepIndex.State]] via the same rep-mediated discovery the
  * batch path gates (d17), but the stream writes O(delta) per batch,
  * not the full state.
  *
  * Why deltas merge EXACTLY here (the LSM property the state's algebra
  * provides for free):
  *  - a node's cluster_id only DECREASES over time (components only
  *    merge, and the label is the component minimum) — so the label
  *    store is min-mergeable: each segment holds the batch's new/changed
  *    label rows, and `min(cluster_id) GROUP BY id` over all segments IS
  *    the current label of every node, order-free;
  *  - rep RETIREMENT is monotone (a rep leaves when its cluster absorbs
  *    a smaller id; the minimum never grows back) — so index rows are
  *    additions ∪-minus a tombstone set: per batch, one segment of the
  *    NEW reps' band/array rows plus the retired rep ids, and the live
  *    index is (∪ additions) anti-join (∪ tombstones).
  * Both reads are one multi-path scan + one aggregate/anti-join;
  * compaction (live segments > maxSegments) rewrites the RESOLVED state
  * as a single segment with empty tombstones. Crash safety and
  * re-delivery idempotence come from the shared [[Segments]] manifest
  * (rename-commit, high-water batch id). StreamingRepIndexSpec pins the
  * streamed state ≡ the batch build/append path (and through it d17's
  * oracle), re-delivery no-ops, and rep retirement across waves. */
object StreamingRepIndexMaintenance {

  def latestMaxBatch(dir: String): Long =
    Segments.latest(dir).map(_.maxBatch).getOrElse(-1L)

  private def liveSegs(dir: String): Seq[String] =
    Segments.latest(dir).map(_.segments).getOrElse(Nil)

  /** The current serving state, merged-on-read from the live segments.
    * The cold member store (`marr` — non-rep arrays, kept for delete-time
    * rep promotion) is additions minus the CURRENT reps: a member array
    * is written once (as a batch non-rep, or re-written when its rep
    * retires), and any doc that is a rep now must not appear in it. */
  def readLatest(spark: SparkSession, dir: String, idCol: String): RepIndex.State = {
    val segs = liveSegs(dir).map(s => s"$dir/$s")
    require(segs.nonEmpty, s"no committed segments under $dir")
    val labels = spark.read.parquet(segs.map(_ + "/labels"): _*)
      .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
    val retired = spark.read.parquet(segs.map(_ + "/retired"): _*)
    val bands = spark.read.parquet(segs.map(_ + "/bands"): _*)
      .join(retired, Seq(idCol), "left_anti")
    val sharr = spark.read.parquet(segs.map(_ + "/sharr"): _*)
      .join(retired, Seq(idCol), "left_anti")
    // under append-only folding the anti-join filters nothing (members
    // never promote); it keeps the composed State exact if the caller
    // hands it to a batch RepIndex.delete afterwards. Lazy either way:
    // the fold path never materializes marr
    val marr = spark.read.parquet(segs.map(_ + "/marr"): _*)
      .join(sharr.select(col(idCol)), Seq(idCol), "left_anti")
    RepIndex.State(labels, bands, sharr, marr)
  }

  /** The foreachBatch function: fold `batch` (idCol + textCol document
    * rows, ids disjoint from everything already folded) into the stored
    * state, writing only the delta. Wire as
    * `ds.writeStream.foreachBatch(sink(spark, dir, "doc_id", "text")() _)`. */
  def sink(spark: SparkSession, dir: String, idCol: String, textCol: String,
           n: Int = 2, threshold: Double = 0.7,
           rowsPerBand: Int = MinHash.RowsPerBand, maxSegments: Int = 8)(
           batch: DataFrame, batchId: Long): Unit = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // released per micro-batch; all persists are lazy, so a re-delivered
    // (no-op) batch never materializes them
    val sharrB = MinHash.hashedShingleArray(batch, idCol, textCol, n).persist(lvl)
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame](sharrB)
    try Segments.fold(dir, batchId, maxSegments) { seg =>
      val first = liveSegs(dir).isEmpty
      val prev =
        if (first) RepIndex.State(null, null, null, null)
        else {
          // the five delta writes below are five actions: cache the two
          // prev frames they share so the live segments are scanned once,
          // not once per write (marr is cold — never read by the fold)
          val st = readLatest(spark, dir, idCol)
          val p = RepIndex.State(st.labels.persist(lvl), st.bands,
            st.sharr.persist(lvl), st.marr)
          caches += p.labels += p.sharr
          p
        }
      val next0 =
        if (first) RepIndex.build(sharrB, idCol, threshold, rowsPerBand)
        else RepIndex.append(sharrB, prev, idCol, threshold, rowsPerBand)
      // labels drive every downstream frame (rep ids, bands, arrays) and
      // feed four actions — cache them once per batch
      val next = RepIndex.State(next0.labels.persist(lvl), next0.bands,
        next0.sharr, next0.marr)
      caches += next.labels
      // labels delta: rows new or changed this batch (cluster minima only
      // decrease, so stale rows in older segments lose the min-merge)
      val labelsDelta =
        if (first) next.labels
        else next.labels.join(prev.labels, Seq("id", "cluster_id"), "left_anti")
      labelsDelta.write.mode("overwrite").parquet(s"$seg/labels")
      // index delta: the batch's new rep rows + retired rep ids
      val newRepIds =
        if (first) next.sharr.select(col(idCol))
        else next.sharr.select(col(idCol))
          .join(prev.sharr.select(col(idCol)), Seq(idCol), "left_anti")
      next.bands.join(newRepIds, Seq(idCol), "left_semi")
        .write.mode("overwrite").parquet(s"$seg/bands")
      next.sharr.join(newRepIds, Seq(idCol), "left_semi")
        .write.mode("overwrite").parquet(s"$seg/sharr")
      // retired reps (their arrays feed the marr delta too — ONE
      // anti-join plan serves both writes, ids projected for the
      // tombstone file)
      val retiredWithArrays =
        if (first) sharrB.select(col(idCol), col("sharr")).limit(0)
        else prev.sharr.select(col(idCol), col("sharr"))
          .join(next.sharr.select(col(idCol)), Seq(idCol), "left_anti")
      retiredWithArrays.select(col(idCol))
        .write.mode("overwrite").parquet(s"$seg/retired")
      // cold member-array delta: the batch's non-rep arrays, plus the
      // arrays of reps retired THIS batch (moving from the hot rep store
      // to the cold store so a later delete can promote them)
      val batchNonRep = sharrB.select(col(idCol), col("sharr"))
        .join(next.sharr.select(col(idCol)), Seq(idCol), "left_anti")
      batchNonRep.unionByName(retiredWithArrays)
        .write.mode("overwrite").parquet(s"$seg/marr")
    } { cmp =>
      compactInto(spark, dir, idCol, cmp)
    } finally caches.foreach(_.unpersist())
  }

  /** Rewrite the RESOLVED state as one compacted segment (tombstones
    * empty — retirements are already applied by the resolved read). */
  private def compactInto(spark: SparkSession, dir: String, idCol: String,
                          seg: String): Unit =
    writeFull(readLatest(spark, dir, idCol), idCol, seg)

  private def writeFull(st: RepIndex.State, idCol: String, seg: String): Unit = {
    st.labels.write.mode("overwrite").parquet(s"$seg/labels")
    st.bands.write.mode("overwrite").parquet(s"$seg/bands")
    st.sharr.write.mode("overwrite").parquet(s"$seg/sharr")
    st.sharr.select(col(idCol)).limit(0)
      .write.mode("overwrite").parquet(s"$seg/retired")
    st.marr.write.mode("overwrite").parquet(s"$seg/marr")
  }

  /** DELETE a tombstone batch from the streamed state. Rep deletes
    * cannot ride the O(delta) label segments: the segment read resolves
    * each doc's label by MIN across segments (labels only decrease under
    * appends), but a delete RE-ROOTS survivors at a LARGER id — a stale
    * smaller label in an old segment would win the min-merge and
    * resurrect the deleted root. So a delete commits as a full
    * COMPACTION: resolve the live state, apply [[RepIndex.delete]]
    * (promotion from the cold member store included), write ONE
    * `cmp<batchId>` segment, and commit it as the only live segment —
    * O(state) per delete batch, the price of the min-merge invariant;
    * appends stay O(delta), and deletes are the rare transition.
    * Re-delivery is idempotent via the same high-water skip; the
    * cmp-before-commit write order is exactly the case
    * [[Segments.prune]]'s strict-below guard protects. */
  def deleteSink(spark: SparkSession, dir: String, idCol: String,
                 rowsPerBand: Int = MinHash.RowsPerBand)(
                 tombs: DataFrame, batchId: Long): Unit = {
    if (batchId <= latestMaxBatch(dir)) return // re-delivered: no-op
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val st0 = readLatest(spark, dir, idCol)
    val st = RepIndex.State(st0.labels.persist(lvl), st0.bands, st0.sharr,
      st0.marr)
    val d0 = RepIndex.delete(tombs, st, idCol, rowsPerBand)
    val d = RepIndex.State(d0.labels.persist(lvl), d0.bands, d0.sharr, d0.marr)
    try {
      writeFull(d, idCol, s"$dir/cmp$batchId")
      Segments.commit(dir, batchId, Seq(s"cmp$batchId"))
    } finally { st.labels.unpersist(); d.labels.unpersist() }
  }

  def prune(dir: String, keepManifests: Int = 2): Unit =
    Segments.prune(dir, keepManifests)
}
