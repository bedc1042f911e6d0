package graft.streaming

import graft.dedup.MinHash
import graft.ops.BottomK
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.BottomK]] — the 5th streaming≡batch
  * pair (LSH text, SRP embedding, SimHash, paragraph blocks, and now the
  * bottom-k sample): a continuously-maintained uniform sample of
  * everything ever streamed, from which quantile data cards are read at
  * any moment.
  *
  * Because min-k of a set is a function of the SET (not arrival order),
  * the streamed sample is EXACTLY the batch sample of the same rows —
  * not approximately: the state fold is the same min-k merge the batch
  * TakeOrderedAndProject performs. Shards partition by the sample hash;
  * each shard's k-bounded state is a superset of the global sample's
  * members in that shard, so the consumer-side min-k over shard rows
  * reproduces the batch sample verbatim. */
object StreamingBottomK {

  case class Item(id: Long, v: Long)
  case class SampleRow(shard: Int, bk: Long, id: Long, v: Long)

  /** The scalar twin of [[BottomK.sample]]'s salted-md5 ordering key
    * (value-identical to the Column form — pinned in BottomKSpec). */
  def bkHash(id: Long): Long = MinHash.Scalar.hashShingle(id.toString + BottomK.Salt)

  /** Per-shard min-k state over the stream; each trigger re-emits the
    * shard's refreshed sample rows (Update mode). */
  def shardSamples(rows: Dataset[Item], shards: Int, k: Int): Dataset[SampleRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => ((bkHash(r.id) % shards + shards) % shards).toInt)
      .flatMapGroupsWithState[Vector[(Long, Long, Long)], SampleRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[Item], state: GroupState[Vector[(Long, Long, Long)]]) =>
          val merged =
            (state.getOption.getOrElse(Vector.empty) ++
              it.map(r => (bkHash(r.id), r.id, r.v)))
              .distinct.sortBy(t => (t._1, t._2)).take(k)
          state.update(merged)
          merged.iterator.map { case (bk, id, v) => SampleRow(shard, bk, id, v) }
      }
  }

  /** Consumer-side reduction of (possibly stale) emitted shard rows to
    * the global k-row sample: stale rows were only ever evicted FOR
    * smaller keys, so the min-k over everything emitted is the true
    * min-k of everything streamed. */
  def mergeSample(emitted: DataFrame, k: Int): DataFrame =
    emitted.select(col("bk"), col("id"), col("v")).distinct()
      .orderBy(col("bk"), col("id")).limit(k)
}
