package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection main: prints `explain("formatted")` for the named
  * queries (or a default set of the heavy hitters) so plan shapes —
  * broadcasts, pushed filters, partial aggregation, codegen spans — can be
  * reviewed per round. `sbt "runMain graft.Explain [names...]"` */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "j4_threeway", "a3_weighted_geomean", "d3_minhash_lsh",
        "d5_dedup_clusters", "x1_cosine_topk", "x4_ivf_topk", "x6_centroid_assign",
        "a1_keep_best", "t8_tfidf", "c1_corpus_curation", "d8_embedding_dups",
        "t13_vocab_sketch", "a13_rollup", "u10_pivot",
        // round-7 heavies: composed curation, cross-snapshot LSH, bigram
        // LM, iterated k-means, IVFADC
        "c7_curation_v2", "d10_cross_snapshot_dedup", "t21_bigram_logprob",
        "x13_kmeans_2iter", "x14_ivfadc_topk")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
