package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = args.toSeq match {
      case Nil => Seq("o3_global_topk", "u9_membench_ram", "w4_scd_roundtrip",
        "s4_descriptions", "d4_simhash", "t8_tfidf", "j9_join_order", "u8_lscpu_specs")
      case xs => xs
    }
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val nExch = "Exchange".r.findAllIn(plan).length
      val nScan = "FileScan|BatchScan".r.findAllIn(plan).length
      println(s"=== $n: exchanges=$nExch scans=$nScan")
      // interesting lines only
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("TakeOrdered") || l.contains("Window") ||
        l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("PushedFilters") || l.contains("ReadSchema")).take(14)
        .foreach(l => println("  " + l.trim.take(160)))
    }
    spark.stop()
  }
}
