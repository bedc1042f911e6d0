package graft


/** NEGATIVE-RESULT probe, kept for reproducibility: does the x24b
  * second-moment rotation also lift the PQ tier's recall (an OPQ-style
  * pre-rotation)? Measured at sf0.01 with the engine's REAL deterministic
  * hyperplanes: recall@5 0.42 raw -> 0.24 rotated. Concentrating energy
  * into the leading dims starves the later subspaces' sign-bit
  * quantizers (their inputs shrink toward zero, codes become noise,
  * codewords collapse toward the origin) — the opposite of real OPQ,
  * which BALANCES variance across subspaces under a trained k-means
  * codebook. So the rotation ships for the prefix tier only; recorded in
  * SCALE.md. Run: sbt 'Test/runMain graft.RotPqProbe /root/testdata/sf0.01' */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Cosine

object RotPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
// inline: PQ ADC shortlist 20 + exact rerank (the x27 shape, in-plan)
    def rec(corpus: org.apache.spark.sql.DataFrame): Double = {
      val q = corpus.filter(col("vec_id") < 10)
      val exact = Cosine.topK(q, corpus, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val adc = Cosine.pqAdcTopK(q, corpus, "vec_id", "embedding", k = 20,
        centroidFn = Cosine.cellCentroidsSorted)
        .select(col("query_id"), col("neighbor_id"))
      // exact rerank of the 20
      val qv = corpus.select(col("vec_id").as("query_id"),
        Cosine.toDouble(col("embedding")).as("qv"))
      val cv = corpus.select(col("vec_id").as("neighbor_id"),
        Cosine.toDouble(col("embedding")).as("cv"))
      val rr = adc.join(qv, "query_id").join(cv, "neighbor_id")
        .withColumn("sim", Cosine.cosine(col("qv"), col("cv"),
          Cosine.normSq(col("qv")), Cosine.normSq(col("cv"))))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      val top = rr.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
        .select(col("query_id"), col("neighbor_id"))
      val overlap = exact.join(top, Seq("query_id", "neighbor_id"), "left_semi").count()
      overlap.toDouble / exact.count()
    }
    println(f"RAW recall@5 = ${rec(emb)}%.2f")
    val rot = Cosine.moment2Rotation(emb, "embedding", p = 64)
    val rotated = emb.select(col("vec_id"), col("label"),
      Cosine.rotatedPrefix(Cosine.toDouble(col("embedding")), rot).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rotated.count()
    println(f"ROT recall@5 = ${rec(rotated)}%.2f")
    spark.stop()
  }
}
