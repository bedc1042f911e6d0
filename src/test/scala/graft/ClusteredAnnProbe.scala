package graft

/** The missing half of the ANN acceptance matrix's honesty: every
  * recall row is measured on the driver's ISOTROPIC synthetic corpus,
  * where (a) coarse cells carry little neighborhood structure and (b)
  * trained quantizers have little to learn — and the SCALE.md notes
  * keep saying "on clustered real embeddings the gap opens". This probe
  * MEASURES that claim: a deterministic mixture corpus (16 hash-derived
  * unit centers, per-vector hash noise at a chosen spread), then the
  * same measurements the gates make — probe recall at nProbe 1/2/4 for
  * label cells vs k-means cells vs the residual store, and the
  * full-scan quantization ceilings for hash-PQ / trained-PQ /
  * residual-PQ / BQ. Run:
  *   sbt 'Test/runMain graft.ClusteredAnnProbe [n] [spread]' */
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Cosine

object ClusteredAnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val spread = args.lift(1).map(_.toDouble).getOrElse(0.35)
    val dim = 64
    val kClusters = 16
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic corpus: center(c)[d] and noise(i)[d] are xxhash64-
    // derived doubles in [-1, 1]; v_i = center(i mod 16) + spread·noise_i
    def hashedUnit(seed: Column, d: Column): Column =
      (pmod(xxhash64(seed, d), lit(2000001L)) - 1000000L).cast("double") / 1000000.0d
    val centerOf = (c: Column) => transform(sequence(lit(0), lit(dim - 1)),
      d => hashedUnit(concat(lit("ctr:"), c.cast("string")), d))
    val corpus = spark.range(n.toLong)
      .select(col("id").as("vec_id"), pmod(col("id"), lit(kClusters)).as("label"))
      .withColumn("embedding", zip_with(
        centerOf(col("label")),
        transform(sequence(lit(0), lit(dim - 1)),
          d => hashedUnit(concat(lit("nz:"), col("vec_id").cast("string")), d)),
        (c, z) => c + lit(spread) * z))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    println(s"corpus: n=$n dim=$dim clusters=$kClusters spread=$spread")

    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val exact = Cosine.topK(queries, corpus, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count().toDouble
    def recallOf(approx: DataFrame): Double =
      exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count() / nExact
    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_cl_$tag").toString

    // --- probe recall: label cells (the x28b construction) ---
    val labelDir = tmp("lab")
    Cosine.writePqIndex(corpus, corpus.select(col("vec_id"), col("label")),
      "vec_id", "embedding", "label", labelDir,
      centroids = Some(Cosine.cellCentroids(corpus, "label", "embedding")))
    Seq(1, 2, 4).foreach { np =>
      println(f"label-cell hash-PQ   nProbe=$np: recall@5 ${
        recallOf(Cosine.ivfAdcMultiprobeStored(spark, queries, labelDir,
          "vec_id", "embedding", "label", k = 5, nProbe = np))}%.3f")
    }

    // --- probe recall: k-means cells + residual codes (x28c) ---
    val init = corpus.select(col("vec_id"), col("embedding"),
      pmod(xxhash64(col("vec_id")), lit(kClusters)).as("icell"))
    val asg = Cosine.lloydIterations(init, "vec_id", "embedding", "icell", 3)
    val cents = Cosine.cellCentroids(
      asg.select(col("vec_id"), col("assigned_cell").as("cell"))
        .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(col("cell"), col("embedding")), "cell", "embedding")
    val cells = Cosine.assignToCentroids(corpus, "vec_id", "embedding",
        cents, "cell")
      .select(col("vec_id"), col("assigned_cell").as("cell"))
    val resDir = tmp("res")
    Cosine.writeResidualPqIndex(corpus, cells, "vec_id", "embedding",
      "cell", cents, resDir, iters = 4)
    Seq(1, 2, 4).foreach { np =>
      println(f"kmeans residual-PQ   nProbe=$np: recall@5 ${
        recallOf(Cosine.ivfAdcMultiprobeStored(spark, queries, resDir,
          "vec_id", "embedding", "cell", k = 5, nProbe = np))}%.3f")
    }

    // --- quantization ceilings (full-scan two-stage, kShort=20) ---
    println(f"hash-PQ     full-scan: recall@5 ${
      recallOf(Cosine.pqTopKStored(spark, queries, labelDir,
        "vec_id", "embedding", k = 5, kShort = 20))}%.3f")
    val trDir = tmp("tr")
    Cosine.writeTrainedPqIndex(corpus,
      corpus.select(col("vec_id"), col("label")), "vec_id", "embedding",
      "label", trDir, iters = 4)
    println(f"trained-PQ  full-scan: recall@5 ${
      recallOf(Cosine.pqTopKStored(spark, queries, trDir,
        "vec_id", "embedding", k = 5, kShort = 20))}%.3f")
    println(f"residual-PQ full-scan: recall@5 ${
      recallOf(Cosine.pqTopKStored(spark, queries, resDir,
        "vec_id", "embedding", k = 5, kShort = 20))}%.3f")
    val bqDir = tmp("bq")
    Cosine.writeBqIndex(corpus, "vec_id", "embedding", dim, bqDir)
    println(f"BQ          full-scan: recall@5 ${
      recallOf(Cosine.bqTopKStored(spark, queries, bqDir,
        "vec_id", "embedding", k = 5, kShort = 20))}%.3f")
    // how much of the variance sits in the coarse geometry here?
    val norms = cents.groupBy(col("cell"))
      .agg(sqrt(sum(col("centroid") * col("centroid"))).as("nrm"))
      .agg(avg(col("nrm"))).head().getDouble(0)
    val vecNorm = corpus.select(sqrt(aggregate(zip_with(
        Cosine.toDouble(col("embedding")), Cosine.toDouble(col("embedding")),
        (a, b) => a * b), lit(0.0), (acc, x) => acc + x)).as("n"))
      .agg(avg(col("n"))).head().getDouble(0)
    println(f"avg centroid norm $norms%.3f vs avg vector norm $vecNorm%.3f")
    spark.stop()
  }
}
