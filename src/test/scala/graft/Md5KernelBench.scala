package graft

/** Isolated microbench: the composed conv/substring/md5 chain vs the
  * native Md5Long60Expr over the sf0.1 2-gram shingle arrays (the d3/d10
  * per-shingle workload), one JVM, alternating reps.
  * `Test/runMain graft.Md5KernelBench [reps]` */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Md5KernelBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs=${docs.count()}")
    val sh = graft.text.TextAnalysis.shingles(col("text"), 2)
    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      docs.select(c.as("a")).write.format("noop").mode("overwrite").save()
      println(f"[md5bench] $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to reps).foreach { _ =>
      time("composed")(transform(sh,
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
      time("native")(transform(sh,
        s => graft.plans.Md5Long60Expr.md5Long60(s)))
      time("shingles")(sh) // the tokenize+shingle floor without hashing
      time("tokens")(graft.text.TextAnalysis.tokens(col("text")))
      time("textonly")(length(col("text")))
      time("distinct")(array_distinct(split(trim(col("text")), "\\s+")))
      // let-bound variant: evaluate the token array ONCE per row, bind it
      // as a lambda variable so per-window accesses are O(1)
      def shinglesLet(text: org.apache.spark.sql.Column, n: Int) =
        element_at(transform(array(graft.text.TextAnalysis.tokens(text)), tk =>
          array_distinct(
            transform(sequence(lit(0), greatest(size(tk) - n, lit(0))),
              i => concat_ws(" ", (0 until n).map(k => try_element_at(tk, i + k + 1)): _*)))),
          1)
      time("let2")(shinglesLet(col("text"), 2))
      time("let2_md5")(transform(shinglesLet(col("text"), 2),
        s => graft.plans.Md5Long60Expr.md5Long60(s)))
      time("shing8")(graft.text.TextAnalysis.shingles(col("text"), 8))
      time("let8")(shinglesLet(col("text"), 8))
    }
    spark.stop()
  }
}
