package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for SCALE.md's BM25 density claim: measures r1's shape on
  * a duplication-dense corpus with and without `minIdfMicro` pruning and
  * checks the top-1 hits agree. Test-scope utility, not part of the
  * driver contract:
  * `sbt "Test/runMain graft.Bm25PruneBench /tmp/sfbig"` */
object Bm25PruneBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    def run(minIdf: Long): (Double, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val out = graft.text.Bm25.topK(docs.filter(col("doc_id") < 10), docs,
          "doc_id", "text", k = 5, minIdfMicro = minIdf)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val top1 = out.filter(_.getInt(1) == 1)
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      (secs, top1)
    }
    run(0L) // warmup
    val (tFull, top1Full) = run(0L)
    val (tPruned, top1Pruned) = run(200000L)
    val agree = top1Full.count { case (q, d) => top1Pruned.get(q).contains(d) }
    println(f"[bm25-prune] full=$tFull%.2fs pruned(200k)=$tPruned%.2fs " +
      s"top1 agreement $agree/${top1Full.size}")
    spark.stop()
  }
}
