package graft.streaming

import graft.similarity.Cosine
import org.apache.spark.sql.{DataFrame, SparkSession}

/** STREAMING semantic decontamination (twin #11): finalized train-doc
  * batches flow through `foreachBatch` and each batch is gated against
  * the STORED eval-split SRP index ([[Cosine.writeSrpIndex]]) — the
  * production shape of c12, where the eval suite is fixed per release
  * and the train corpus arrives continuously.
  *
  * Why this twin is exact with NO shared state machinery (unlike the
  * index-maintenance twins): the decision for a train doc is a pure
  * function of (that doc's vector, the fixed index, the threshold) —
  * batches do not interact, so streaming over any partition of the
  * corpus equals the batch run over the union, row-for-row
  * (spec-pinned). Each batch's decisions land in their own
  * `out/b<batchId>` directory written with overwrite mode, which makes
  * re-delivery after a crash idempotent: the replayed batch simply
  * rewrites identical rows. Read the union with one multi-path scan
  * (a `b*` glob under the output directory). */
object StreamingDecontaminate {

  /** The foreachBatch function. Wire as
    * `ds.writeStream.foreachBatch(sink(spark, idxDir, outDir, "vec_id",
    * "embedding", 0.34) _)`. */
  def sink(spark: SparkSession, evalIndexDir: String, outDir: String,
           idCol: String, vecCol: String, threshold: Double)(
           batch: DataFrame, batchId: Long): Unit =
    Cosine.semanticDecontaminateStored(spark, batch, evalIndexDir,
        idCol, vecCol, threshold)
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
}
