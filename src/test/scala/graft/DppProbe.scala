package graft

import graft.dedup.{MinHash, RepIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Diagnostic: does RepIndex.searchStored's dynamic partition filter
  * actually PRUNE at runtime (scan metrics: partitions/files read), or
  * does the plan carry the filter while the scan still reads every
  * (band, pbucket) directory? Prints per-scan post-execution metrics for
  * a point probe. Run: sbt 'Test/runMain graft.DppProbe /tmp/sf1' */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        sys.env.getOrElse("DPP_REUSE_ONLY", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    val bucket = graft.text.TextAnalysis.splitBucket(col("doc_id"))
    val sharr = MinHash.hashedShingleArray(
      docs.filter(bucket < 60), "doc_id", "text", 2)
    val tmp = java.nio.file.Files.createTempDirectory("dppprobe").toString
    RepIndex.write(RepIndex.build(sharr, "doc_id"), tmp)
    // probe docs drawn from the INDEXED set so the search HITS — an
    // empty result lets AQE collapse the final plan to EmptyRelation and
    // the scan metrics vanish with it
    val probe = MinHash.hashedShingleArray(
      docs.filter(bucket < 60 && col("doc_id") % 1999 === 0),
      "doc_id", "text", 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"PROBE docs=${probe.count()}")
    val out = RepIndex.searchStored(spark, probe, tmp, "doc_id")
    // collect() drives the SAME memoized QueryExecution whose executed
    // plan we inspect (count() would build and execute a different one)
    println(s"HITS ${out.collect().length}")
    val unpruned = RepIndex.search(probe, RepIndex.read(spark, tmp), "doc_id")
    println(s"HITS_UNPRUNED ${unpruned.collect().length}")
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          other.children.flatMap(scans) ++
            other.subqueries.flatMap(scans)
      }
    def report(tag: String, df: org.apache.spark.sql.DataFrame): Unit =
      scans(df.queryExecution.executedPlan).foreach { f =>
        val path = f.relation.location.rootPaths.mkString(",")
        val m = f.metrics
        def v(k: String): String = m.get(k).map(_.value.toString).getOrElse("-")
        println(s"$tag SCAN $path partitions=${v("numPartitions")} " +
          s"files=${v("numFiles")} staticPruneMs=${v("pruningTime")} " +
          s"bytes=${v("filesSize")} rows=${v("numOutputRows")}")
        if (f.partitionFilters.nonEmpty)
          println(s"$tag PFILTERS ${f.partitionFilters.mkString(" ;; ")}")
      }
    report("PRUNED", out)
    report("UNPRUNED", unpruned)
    // prefix stored rerank: does its dynamic partition filter survive to
    // runtime? (single query → shortlist touches few pbuckets)
    val emb = Tables.embeddings(spark, dir)
    val pdir = java.nio.file.Files.createTempDirectory("dppprefix").toString
    graft.similarity.Cosine.writePrefixIndex(emb, "vec_id", "embedding", 16, pdir)
    val pout = graft.similarity.Cosine.prefixTopKStored(spark,
      emb.filter(col("vec_id") === 1), pdir, "vec_id", "embedding", k = 5)
    println(s"PREFIX HITS ${pout.collect().length}")
    report("PREFIX", pout)
    spark.stop()
  }
}
