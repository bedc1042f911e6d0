package graft.ops

import org.apache.spark.sql.DataFrame

/** Size-targeted output writing — the small-files fix every long-running
  * pipeline needs. A shuffle with N partitions writes N files per
  * partition-column value regardless of size: at 100 TB that's either
  * millions of KB-sized files (metadata pressure on every downstream
  * scan) or a handful of 100 GB ones (no read parallelism). This sizes
  * the file count from Catalyst's own byte statistics instead of the
  * shuffle fan-out.
  *
  * The estimate is the optimizer's `sizeInBytes` (propagated from source
  * file sizes through filters/projections), so no extra pass over the
  * data; `maxRecordsPerFile` is the belt-and-braces cap when the estimate
  * is badly off for wide rows.
  */
object Compact {

  /** Number of output files to hit `targetBytes` per file for this frame,
    * per Catalyst's size estimate (≥ 1). */
  def targetFileCount(df: DataFrame, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (est + targetBytes - 1) / targetBytes
    n.min(BigInt(Int.MaxValue)).max(1).toInt
  }

  /** Repartition to the size-derived file count and write. `coalesce`
    * when shrinking (no shuffle — narrows the existing partitioning),
    * `repartition` when growing (a shuffle is unavoidable to gain
    * parallel writers). */
  def writeCompacted(df: DataFrame, path: String, targetBytes: Long,
                     format: String = "parquet",
                     maxRecordsPerFile: Long = 0L): Unit = {
    val files = targetFileCount(df, targetBytes)
    val sized =
      if (files < df.rdd.getNumPartitions) df.coalesce(files)
      else df.repartition(files)
    val w = sized.write.mode("overwrite").format(format)
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
     else w).save(path)
  }
}
