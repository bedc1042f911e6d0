package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus materialization tail: deterministic sharding of curated
  * documents into N balanced output shards, with a per-shard MANIFEST
  * (doc/token counts, an order-independent content checksum, id bounds)
  * — what a 100 TB pipeline writes alongside the shards so a trainer can
  * verify and resume without re-reading data.
  *
  * Sharding is salted-md5 on the id (RNG-free, the t7/t9 convention with
  * its own salt), so membership is reproducible across runs and engines.
  * The checksum is `bit_xor` of per-doc 60-bit content fingerprints —
  * order-independent AND overflow-free, so it is identical no matter how
  * partitions merge (a sum would trip ANSI overflow at corpus scale).
  *
  * Scale: the manifest is one combine-enabled aggregation producing
  * nShards rows; the write is one `repartition(shard)` — each output
  * task owns whole shards, no post-hoc file merge. */
object Sharding {

  def shardCol(id: Column, nShards: Int, salt: String = ":graft-shard-v1"): Column =
    pmod(graft.plans.Md5Long60Expr.md5Long60(concat(id.cast("string"), lit(salt))), lit(nShards.toLong))

  /** Per-shard manifest over (id, text) rows: one output row per shard at
    * any corpus size. */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame =
    docs.select(col(idCol),
        shardCol(col(idCol), nShards).as("shard"),
        size(filter(graft.text.TextAnalysis.tokens(col(textCol)),
          t => t =!= "")).cast("long").as("n_toks"),
        graft.plans.Md5Long60Expr.md5Long60(col(textCol)).as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        bit_xor(col("fp")).as("checksum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
      .orderBy(col("shard"))

  /** Materialize the shards: parquet partitioned by shard, one writer
    * task per shard (repartition on the shard key). Returns the frame
    * that was written (with its shard column) for downstream reuse. */
  def shardedWrite(docs: DataFrame, idCol: String, dir: String,
                   nShards: Int): DataFrame = {
    val withShard = docs.withColumn("shard", shardCol(col(idCol), nShards))
    withShard.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    withShard
  }
}
