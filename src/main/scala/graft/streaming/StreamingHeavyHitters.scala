package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the incremental counterpart of the batch
  * t17 operator: keys arrive on a stream and each micro-batch refreshes
  * a bounded Misra-Gries summary, without reprocessing history.
  *
  * State is SHARDED by `h mod shards`: each shard holds its own k-counter
  * MG map in `GroupState`, so state partitions spread across executors
  * and no single hot state bottlenecks the trigger. Because sharding is
  * BY KEY, an item's entire mass lands in one shard, and the shard-local
  * guarantee implies the global one: any item with total count
  * > N_total/(k+1) ≥ N_shard/(k+1) survives its shard's summary. Reading
  * the per-shard summaries back is the same union [[graft.plans.MgMergeAgg]]
  * performs for stored batch summaries (counter-wise sum + trim) — or,
  * for candidate routing, just the concatenation (still a superset).
  *
  * Emission is `Update`-mode: each trigger re-emits the summaries of the
  * shards that changed; the memory/table sink keeps the latest row per
  * (shard, h). Production bounds state with the RocksDB store provider;
  * the MG map itself is already k-bounded by construction.
  */
object StreamingHeavyHitters {

  case class ShardCounter(shard: Int, h: Long, cnt_lb: Long)

  /** Per-shard MG update — same decrement-all rule as the batch
    * [[graft.plans.MisraGriesAgg]], on a plain map. */
  private[streaming] def mgUpdate(m: scala.collection.mutable.Map[Long, Long],
                                  h: Long, k: Int): Unit = {
    m.get(h) match {
      case Some(c) => m.update(h, c + 1L)
      case None if m.size < k => m.update(h, 1L)
      case None =>
        val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
        m.keysIterator.foreach { key =>
          val nv = m(key) - 1L
          if (nv == 0L) dead += key else m.update(key, nv)
        }
        dead.foreach(m.remove)
    }
  }

  /** `keys` → one refreshed summary row per (shard, surviving key) each
    * trigger. `k` counters per shard. */
  def summaries(keys: Dataset[Long], shards: Int, k: Int): Dataset[ShardCounter] = {
    import keys.sparkSession.implicits._
    keys.groupByKey(h => (h % shards + shards).toInt % shards)
      .flatMapGroupsWithState[Map[Long, Long], ShardCounter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[Long], state: GroupState[Map[Long, Long]]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(m ++= _)
          rows.foreach(h => mgUpdate(m, h, k))
          state.update(m.toMap)
          m.iterator.map { case (h, c) => ShardCounter(shard, h, c) }
      }
  }
}
