package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Torn-artifact guard sampler for partitioned stores: ONE row from EACH
  * `partCol=value` directory, read as independent limit(1) scans — a
  * partial in-place rewrite can re-bucket some directories and not
  * others, so a single unordered sample can land in an already-correct
  * directory and wave the torn remainder through, while a groupBy over
  * the whole store pays a first-probe scan proportional to STORE size.
  * This sampler's cost is bounded by directory count (≤ the pinned
  * modulus): each limit(1) stops at the first row of one row group.
  * Directory values are the raw `partCol=` suffixes (the guards use
  * integer bucket keys, never escaped strings). Empty directories
  * contribute nothing. */
object PartitionSample {

  def firstRows(spark: SparkSession, base: String, partCol: String)(
      project: DataFrame => DataFrame): Seq[(String, Row)] = {
    val bp = new org.apache.hadoop.fs.Path(base)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bp)) Nil
    else fs.listStatus(bp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
      .flatMap { st =>
        val v = st.getPath.getName.drop(partCol.length + 1)
        project(spark.read.parquet(st.getPath.toString)).limit(1).collect()
          .headOption.map(v -> _)
      }
  }

  /** Two-level variant for `outer=/inner=` trees (the RepIndex
    * (band, pbucket) layout): one row from EACH leaf directory, returned
    * as (outerValue, innerValue, row). Cost is bounded by the leaf
    * directory count — bandCount × modulus for the band trees, both
    * pinned constants — never by store size. */
  def firstRowsNested(spark: SparkSession, base: String, outerCol: String,
                      innerCol: String)(
      project: DataFrame => DataFrame): Seq[(String, String, Row)] = {
    val bp = new org.apache.hadoop.fs.Path(base)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bp)) Nil
    else fs.listStatus(bp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(outerCol + "="))
      .flatMap { st =>
        val outer = st.getPath.getName.drop(outerCol.length + 1)
        firstRows(spark, st.getPath.toString, innerCol)(project)
          .map { case (inner, r) => (outer, inner, r) }
      }
  }
}
