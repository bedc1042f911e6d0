package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the heavy dedup queries: times each
  * pipeline stage separately, several repetitions in one JVM, so
  * regressions can be localized without the Spark UI.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile [reps]"` */
object Profile {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "WARN"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s rows=$n%-9d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    (1 to reps).foreach { r =>
      println(s"---- rep $r")
      val docs = Tables.documents(spark, dir)
      import graft.dedup.{Clusters, MinHash}

      val sharr = MinHash.hashedShingleArray(docs, "doc_id", "text", 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("d3.sharr")(sharr.count())
      val sig = MinHash.signaturesFromArray(sharr, "doc_id")
      time("d3.signatures")(sig.count())
      val bands = MinHash.bandRows(sig, "doc_id")
      time("d3.bands")(bands.count())
      val l = bands.select(col("doc_id").as("id_a"), col("band"), col("band_hash"))
      val rr = bands.select(col("doc_id").as("id_b"), col("band"), col("band_hash"))
      val pairs = l.join(rr, Seq("band", "band_hash")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("d3.candidates")(pairs.count())
      time("d3.verify_arrays")(
        MinHash.verifyJaccardArrays(pairs, sharr, "doc_id")
          .filter(col("jaccard") >= 0.7).count())
      pairs.unpersist(); sharr.unpersist()

      val nd = MinHash.nearDuplicates(docs, "doc_id", "text", 2, 0.7)
      time("d3.nd_plan_only")({ nd.queryExecution.executedPlan; 0L })
      time("d3.nearDuplicates_e2e")(nd.count())

      val exact = MinHash.exactJaccardPairs(docs, "doc_id", "text", 2, 0.8)
      time("d5.exact_pairs")(exact.count())
      val pairsCached = MinHash.exactJaccardPairs(docs, "doc_id", "text", 2, 0.8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("d5.pairs_materialize")(pairsCached.count())
      time("d5.cc_on_cached_pairs")(
        Clusters.connectedComponents(pairsCached).count())
      pairsCached.unpersist()
      time("d5.components_e2e")(
        Clusters.connectedComponents(
          MinHash.exactJaccardPairs(docs, "doc_id", "text", 2, 0.8)).count())
    }
    spark.stop()
  }
}
