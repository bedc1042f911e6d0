package graft.streaming

import graft.text.Dsir
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING DSIR scoring (twin #13): raw-pool document batches flow
  * through `foreachBatch` and each batch scores against the STORED
  * importance model ([[Dsir.writeModel]] — LM counters + pinned bucket
  * modulus) — the production shape of c13, where the target domain is
  * fixed per release and the raw pool arrives continuously.
  *
  * Exact with NO shared state machinery (the StreamingDecontaminate
  * argument): a doc's (lr_micro, g_micro, key_micro) is a pure function
  * of (that doc, the fixed model, the salt) — batches do not interact,
  * so streaming over any partition of the pool equals the batch scoring
  * of the union, row-for-row (spec-pinned). Each batch's scores land in
  * their own `out/b<batchId>` directory written with overwrite mode, so
  * crash re-delivery rewrites identical rows (idempotent). Read the
  * union with one multi-path `b*` glob; the Gumbel-top-k SELECTION is a
  * downstream batch decision over that union (a top-k is not a pure
  * per-doc function, so it does not belong in the per-batch scorer). */
object StreamingDsirScore {

  /** The foreachBatch function. Wire as
    * `ds.writeStream.foreachBatch(sink(spark, modelDir, outDir,
    * "doc_id", "text") _)`. */
  def sink(spark: SparkSession, modelDir: String, outDir: String,
           idCol: String, textCol: String)(
           batch: DataFrame, batchId: Long): Unit =
    Dsir.importanceStored(spark, batch, idCol, textCol, modelDir)
      .withColumn("g_micro", Dsir.gumbelMicro(col(idCol)))
      .withColumn("key_micro", col("lr_micro") + col("g_micro"))
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
}
