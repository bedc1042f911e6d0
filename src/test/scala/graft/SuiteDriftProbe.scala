package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not a test): measures whether repeated query
  * execution in one session degrades — the round-10 bench drift
  * investigation (c3 measured 2.4 s fresh, 13 s after ~100 suite
  * queries, with CLEAN per-run micro-cals, so not host starvation).
  * Run: sbt 'Test/runMain graft.SuiteDriftProbe [query] [iters]'. */
object SuiteDriftProbe {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("c3_contamination")
    val iters = args.lift(1).map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(qname)
    def block(tag: String): Unit = {
      val bm = org.apache.spark.SparkEnv.get.blockManager
      println(s"[probe] $tag broadcastBlocks=" +
        bm.getMatchingBlockIds(_.isBroadcast).size)
    }
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      println(f"[probe] run $i%2d: $s%6.2f s")
      block(s"after$i")
    }
    spark.stop()
  }
}
