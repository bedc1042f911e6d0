package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for SCALE.md's d12 band-knob curve: runs the d12 recall
  * harness (fixed 500-doc probe panel, exact panel truth vs banded LSH)
  * on a duplication-dense corpus at several `rowsPerBand` settings —
  * the density dial that recovers recall when banding at the default
  * width starts missing moderately-similar dups. Test-scope utility:
  * `sbt "Test/runMain graft.LshBandBench /tmp/sfbig"` */
object LshBandBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val probeIds = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(500)
    val sharr = graft.dedup.MinHash.hashedShingleArray(docs, "doc_id", "text", 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = sharr.select(col("doc_id"), explode(col("sharr")).as("shash"))
    val sizes = sharr.select(col("doc_id"), size(col("sharr")).as("n"))
    val exact = sh.join(broadcast(probeIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("q"), col("shash"))
      .join(sh.select(col("doc_id").as("nbr"), col("shash")), "shash")
      .filter(col("q") =!= col("nbr"))
      .groupBy(col("q"), col("nbr")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("q"), col("n").as("nq")), "q")
      .join(sizes.select(col("doc_id").as("nbr"), col("n").as("nn")), "nbr")
      .filter(col("inter").cast("double")
        / (col("nq") + col("nn") - col("inter")) >= 0.7)
      .select(col("q"), col("nbr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()
    for (r <- Seq(8, 4, 2)) {
      val t0 = System.nanoTime()
      val lshPairs = graft.dedup.MinHash.nearDuplicatesFromArray(sharr,
        "doc_id", threshold = 0.7, rowsPerBand = r)
      val lsh = lshPairs.select(col("id_a").as("q"), col("id_b").as("nbr"))
        .unionAll(lshPairs.select(col("id_b").as("q"), col("id_a").as("nbr")))
        .join(broadcast(probeIds.withColumnRenamed("doc_id", "q")), Seq("q"),
          "left_semi")
      val nHit = exact.join(lsh, Seq("q", "nbr"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[lsh-band] rowsPerBand=$r recall=${nHit.toDouble / nExact}%.6f " +
        f"($nHit/$nExact) lsh_secs=$secs%.2f")
    }
    spark.stop()
  }
}
