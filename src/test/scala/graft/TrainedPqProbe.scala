package graft

/** Acceptance probe for the TRAINED PQ tier (run before gating x27b):
  * recall@5 of the stored two-stage PQ search (ADC shortlist 20 + exact
  * rerank) under the hash (SRP) quantizer vs per-subspace k-means
  * codebooks, same 4 bit/subspace budget, sf0.01 corpus.
  * Run: sbt 'Test/runMain graft.TrainedPqProbe /root/testdata/sf0.01' */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Cosine

object TrainedPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus=${emb.count()}")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Cosine.topK(q, emb, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()
    def recall(storeDir: String): Double = {
      val approx = Cosine.pqTopKStored(spark, q, storeDir, "vec_id",
        "embedding", k = 5, kShort = 20)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
        .toDouble / exact.count()
    }
    val srpDir = java.nio.file.Files.createTempDirectory("pq_srp").toString
    Cosine.writePqIndex(emb, emb.select(col("vec_id"), col("label")),
      "vec_id", "embedding", "label", srpDir)
    println(f"SRP recall@5     = ${recall(srpDir)}%.3f")
    Seq(2, 4, 8, 16).foreach { it =>
      val tDir = java.nio.file.Files.createTempDirectory(s"pq_tr$it").toString
      val t0 = System.nanoTime()
      Cosine.writeTrainedPqIndex(emb, emb.select(col("vec_id"), col("label")),
        "vec_id", "embedding", "label", tDir, iters = it)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"TRAINED iters=$it%2d recall@5 = ${recall(tDir)}%.3f (train+write ${secs}%.1f s)")
    }
    spark.stop()
  }
}
