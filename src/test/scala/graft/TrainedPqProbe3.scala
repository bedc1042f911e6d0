package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Cosine

/** OPQ-lite probe: trained PQ over the second-moment ROTATED basis —
  * RotPqProbe showed the rotation KILLS the hash quantizer (0.42→0.24:
  * sign-bit codes starve in the low-energy tail subspaces); do TRAINED
  * codewords, which adapt to the rotated energy profile, recover it? */
object TrainedPqProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val q0 = emb.filter(col("vec_id") < 10)
    val exact = Cosine.topK(q0, emb, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()
    def recall(storeDir: String, queries: org.apache.spark.sql.DataFrame): Double = {
      val approx = Cosine.pqTopKStored(spark, queries, storeDir, "vec_id",
        "embedding", k = 5, kShort = 20)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
        .toDouble / exact.count()
    }
    val rot = Cosine.moment2Rotation(emb, "embedding", p = 64)
    val rotated = emb.select(col("vec_id"), col("label"),
      Cosine.rotatedPrefix(Cosine.toDouble(col("embedding")), rot).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rotated.count()
    Seq(4, 8).foreach { it =>
      val tDir = java.nio.file.Files.createTempDirectory(s"pq_rot$it").toString
      Cosine.writeTrainedPqIndex(rotated,
        rotated.select(col("vec_id"), col("label")),
        "vec_id", "embedding", "label", tDir, iters = it)
      // queries must live in the SAME rotated basis; rerank/truth are in
      // rotated space too, but the rotation preserves cosine exactly
      println(f"ROT+TRAINED iters=$it recall@5 = ${recall(tDir, rotated.filter(col("vec_id") < 10))}%.3f")
    }
    spark.stop()
  }
}
