package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Diagnostic: runtime scan metrics (partitions/files/bytes actually
  * read) for the round-12 BM25 and IVF pruned stored serving paths —
  * the same executed-plan measurement DppProbe makes for the rep/prefix
  * layouts (an un-executed plan's filter strings are not evidence; the
  * round-12 DPP lesson). Prints one line per scan plus wall-clock for
  * pruned vs canonical serving. Run:
  * sbt 'Test/runMain graft.StoredServingProbe /tmp/sf1' */
object StoredServingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
      }
    def report(tag: String, df: DataFrame): Unit =
      scans(df.queryExecution.executedPlan).foreach { f =>
        val path = f.relation.location.rootPaths.mkString(",")
        val m = f.metrics
        def v(k: String): String = m.get(k).map(_.value.toString).getOrElse("-")
        println(s"$tag SCAN $path partitions=${v("numPartitions")} " +
          s"files=${v("numFiles")} bytes=${v("filesSize")} rows=${v("numOutputRows")}")
      }
    // first evaluation pays JVM/codegen warmup: evaluate once, then time
    // the second run (the Bench harness convention)
    def timed[T](f: => T): (T, Double) = {
      f
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- BM25: point probe over the bucketed postings layout
    val docs = Tables.documents(spark, dir)
    val bdir = java.nio.file.Files.createTempDirectory("svprobe_bm25").toString
    val idx = graft.text.Bm25.buildIndex(docs, "doc_id", "text")
    graft.text.Bm25.writeIndex(idx, bdir)
    idx.postings.unpersist()
    val probe = docs.filter(col("doc_id") === 7)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"BM25 probe docs=${probe.count()}")
    val (prunedRows, pt) = timed {
      val out = graft.text.Bm25.searchStored(spark, probe, bdir,
        "doc_id", "text", k = 10)
      val n = out.collect().length
      report("BM25_PRUNED", out); n
    }
    val (canonRows, ct) = timed {
      val out = graft.text.Bm25.searchIndex(probe,
        graft.text.Bm25.readIndex(spark, bdir), "doc_id", "text", k = 10)
      val n = out.collect().length
      report("BM25_CANONICAL", out); n
    }
    println(f"BM25 pruned=$pt%.2fs rows=$prunedRows canonical=$ct%.2fs rows=$canonRows")

    // ---- IVF: 1-query probe over the per-cell lists layout
    val emb = Tables.embeddings(spark, dir)
    val idir = java.nio.file.Files.createTempDirectory("svprobe_ivf").toString
    graft.similarity.Cosine.writeIvfIndex(
      emb.select(col("vec_id"), col("embedding")),
      emb.select(col("vec_id"), col("label")),
      graft.similarity.Cosine.cellCentroidsSorted(emb, "label", "embedding"),
      "vec_id", "embedding", "label", idir)
    val q1 = emb.filter(col("vec_id") === 3)
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"IVF probe queries=${q1.count()}")
    for (np <- Seq(1, 3)) {
      val (n, t) = timed {
        val out = graft.similarity.Cosine.ivfSearchStored(spark, q1, idir,
          "vec_id", "embedding", "label", k = 5, nProbe = np)
        val r = out.collect().length
        report(s"IVF_PRUNED_np$np", out); r
      }
      println(f"IVF pruned nProbe=$np $t%.2fs rows=$n")
    }
    val cells = emb.select(col("vec_id"), col("label"))
    val cents = spark.read.parquet(s"$idir/centroids")
    val lists = spark.read.parquet(s"$idir/lists")
    val (cn, ctt) = timed {
      val out = graft.similarity.Cosine.ivfSearchIndex(q1,
        lists.select(col("vec_id"), col("embedding")),
        lists.select(col("vec_id"), col("label")), cents,
        "vec_id", "embedding", "label", k = 5, nProbe = 3)
      val r = out.collect().length
      report("IVF_CANONICAL", out); r
    }
    println(f"IVF canonical nProbe=3 $ctt%.2fs rows=$cn")
    println(s"IVF cells total=${new java.io.File(s"$idir/lists").listFiles()
      .count(_.getName.startsWith("pcell="))}")
    spark.stop()
  }
}
