package graft

/** Decomposition probe for the residual IVFADC tier (run for the
  * SCALE.md row): isolates the QUANTIZATION side of x28c from the probe
  * side by running the full-scan two-stage chain (x27's measurement) over
  * all three stored-PQ constructions — hash codes (writePqIndex), trained
  * codes (writeTrainedPqIndex), residual trained codes
  * (writeResidualPqIndex over k-means coarse cells) — plus per-vector
  * quantization MSE and the coarse-centroid norm (on an isotropic corpus
  * centroids sit near the origin, so residual ≈ raw and the residual
  * win is bounded; on clustered real embeddings it opens up).
  * Run: sbt 'Test/runMain graft.ResidualPqProbe [sfDir]' */
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Cosine

object ResidualPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val exact = Cosine.topK(queries, emb, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count().toDouble

    def recallOf(approx: DataFrame): Double =
      exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count() / nExact

    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_rpq_$tag").toString

    // hash-quantizer store (x27's construction)
    val hashDir = tmp("hash")
    Cosine.writePqIndex(emb, emb.select(col("vec_id"), col("label")),
      "vec_id", "embedding", "label", hashDir)
    println(f"hash PQ      full-scan recall@5: ${
      recallOf(Cosine.pqTopKStored(spark, queries, hashDir,
        "vec_id", "embedding", k = 5, kShort = 20))}%.3f")

    // trained raw-vector store (x27b's construction)
    val trainDir = tmp("train")
    Cosine.writeTrainedPqIndex(emb, emb.select(col("vec_id"), col("label")),
      "vec_id", "embedding", "label", trainDir, iters = 4)
    println(f"trained PQ   full-scan recall@5: ${
      recallOf(Cosine.pqTopKStored(spark, queries, trainDir,
        "vec_id", "embedding", k = 5, kShort = 20))}%.3f")

    // residual store over k-means coarse cells (x28c's construction)
    val init = emb.select(col("vec_id"), col("embedding"),
      pmod(xxhash64(col("vec_id")), lit(16)).as("icell"))
    val asg = Cosine.lloydIterations(init, "vec_id", "embedding", "icell", 3)
    val cents = Cosine.cellCentroids(
      asg.select(col("vec_id"), col("assigned_cell").as("cell"))
        .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(col("cell"), col("embedding")), "cell", "embedding")
    val cells = Cosine.assignToCentroids(emb, "vec_id", "embedding",
        cents, "cell")
      .select(col("vec_id"), col("assigned_cell").as("cell"))
    val resDir = tmp("res")
    Cosine.writeResidualPqIndex(emb, cells, "vec_id", "embedding", "cell",
      cents, resDir, iters = 4)
    println(f"residual PQ  full-scan recall@5: ${
      recallOf(Cosine.pqTopKStored(spark, queries, resDir,
        "vec_id", "embedding", k = 5, kShort = 20))}%.3f")

    // how much geometry do the coarse cells carry? centroid norms vs the
    // unit-norm corpus — near-zero norms mean residual ≈ raw
    val norms = cents.groupBy(col("cell"))
      .agg(sqrt(sum(col("centroid") * col("centroid"))).as("norm"))
      .agg(min(col("norm")), avg(col("norm")), max(col("norm")))
      .head()
    println(f"coarse centroid norm min/avg/max: ${norms.getDouble(0)}%.3f " +
      f"/ ${norms.getDouble(1)}%.3f / ${norms.getDouble(2)}%.3f")

    // per-vector quantization MSE of each store's reconstruction
    Seq(("hash", hashDir), ("trained", trainDir), ("residual", resDir))
      .foreach { case (tag, d) =>
        val approx = Cosine.pqTopKStored(spark, queries, d,
          "vec_id", "embedding", k = 5, kShort = 2000)
        val mse = approx.agg(avg(lit(1.0) - col("adc_sim"))).head().getDouble(0)
        println(f"$tag%-8s mean (1 - adc_sim) over shortlist: $mse%.4f")
      }
    spark.stop()
  }
}
