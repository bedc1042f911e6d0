package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic for the r12 verdict's one scale-killer: what actually
  * transits the SELECTION stage of DSIR under (a) the old un-partitioned
  * row_number window + rank filter versus (b) the shipped
  * `Dsir.selectScored` distributed top-k. FINDING (recorded in SCALE.md):
  * Spark 4.1's InferWindowGroupLimit/LimitPushDownThroughWindow already
  * RESCUES shape (a) at runtime — the executed plan is `Window` over
  * `TakeOrderedAndProject(limit=n)` with NO single-partition exchange of
  * the pool — but only while the rank filter stays adjacent to the
  * window; the initial plan still prints the Exchange SinglePartition.
  * Shape (b) makes the bound STRUCTURAL (orderBy+limit is the plan, not
  * an optimizer rescue), which is why it ships. The probe prints any
  * selection-stage exchanges, the executed-plan shapes (DSIR_PROBE_PLAN),
  * wall-clock, and asserts value identity between the two forms.
  * Run: sbt 'Test/runMain graft.DsirSelectProbe /root/testdata/sf0.1' */
object DsirSelectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scored = graft.text.Dsir.importance(
        Tables.documents(spark, dir), "doc_id", "text", "source", "src0")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"POOL scored=${scored.count()}")

    def exchanges(p: org.apache.spark.sql.execution.SparkPlan) =
      PlanWalk.exchanges(p)
    def report(tag: String, df: org.apache.spark.sql.DataFrame): Set[(Any, Any, Any, Any, Any, Any)] = {
      val t0 = System.nanoTime()
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      exchanges(df.queryExecution.executedPlan).foreach { e =>
        def v(k: String): String = e.metrics.get(k).map(_.value.toString).getOrElse("-")
        println(f"$tag EXCHANGE ${e.outputPartitioning} " +
          s"records=${v("numOutputRows")} dataSize=${v("dataSize")}")
      }
      println(f"$tag n=${rows.length} sec=$sec%.2f")
      if (sys.env.contains("DSIR_PROBE_PLAN"))
        println(s"$tag PLAN\n${df.queryExecution.executedPlan}")
      rows.map(r => (r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5))).toSet
    }

    // (a) the pre-r13 shape: un-partitioned window over the full pool
    val keyed = scored
      .withColumn("g_micro", graft.text.Dsir.gumbelMicro(col("doc_id")))
      .withColumn("key_micro", col("lr_micro") + col("g_micro"))
    val oldForm = keyed
      .withColumn("rank", row_number().over(
        Window.orderBy(col("key_micro").desc, col("doc_id").asc)))
      .filter(col("rank") <= 100)
      .select(col("doc_id"), col("rank"), col("n_tokens"), col("lr_micro"),
        col("g_micro"), col("key_micro"))
    val a = report("OLD_WINDOW", oldForm)

    // (b) the shipped distributed form
    val b = report("TOPK", graft.text.Dsir.selectScored(scored, "doc_id", 100))

    assert(a == b, "forms diverged — selectScored is NOT value-identical")
    println("IDENTICAL true")
    spark.stop()
  }
}
