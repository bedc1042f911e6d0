package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Cosine

/** Quantization-MSE probe: does the trained codebook strictly reduce
  * reconstruction error vs SRP, round by round? (k-means sanity) */
object TrainedPqProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    // mean ||x - recon||^2 given a dir with codebook+codes
    def mse(storeDir: String): Double =
      graft.similarity.PqTestMse.reconMse(spark, emb, storeDir)
    val srpDir = java.nio.file.Files.createTempDirectory("pq_srp").toString
    Cosine.writePqIndex(emb, emb.select(col("vec_id"), col("label")),
      "vec_id", "embedding", "label", srpDir)
    println(f"SRP mse = ${mse(srpDir)}%.5f")
    Seq(1, 2, 4, 8, 16).foreach { it =>
      val tDir = java.nio.file.Files.createTempDirectory(s"pq_t$it").toString
      Cosine.writeTrainedPqIndex(emb, emb.select(col("vec_id"), col("label")),
        "vec_id", "embedding", "label", tDir, iters = it)
      println(f"TRAINED iters=$it%2d mse = ${mse(tDir)}%.5f")
    }
    // also: norms of the embeddings (normalized or not?)
    val n = emb.select(sqrt(aggregate(zip_with(
      Cosine.toDouble(col("embedding")), Cosine.toDouble(col("embedding")),
      (a, b) => a * b), lit(0.0), (acc, x) => acc + x)).as("nrm"))
    n.agg(min("nrm"), avg("nrm"), max("nrm")).show()
    spark.stop()
  }
}
