package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for SCALE.md's BM25 pruning claim, measuring the
  * quantity the knob actually controls: the inverted-index JOIN FAN-OUT
  * (scored (query-term, posting) rows) with and without `minIdfMicro`
  * pruning, plus interleaved A/B wall times and top-1 agreement.
  *
  * Round-9 measurement lesson baked in: wall-clock at 50k docs on a
  * noisy host is drift-bound (the original full→pruned ordering
  * "measured" −37% on a corpus where NO term crossed the cutoff — pure
  * run-order drift). The fan-out count is deterministic, and it is the
  * thing that grows with corpus × stopword density at real scale.
  * Test-scope utility, not part of the driver contract:
  * `sbt "Test/runMain graft.Bm25PruneBench /tmp/sfstop"`
  * (build the corpus with `tools/make_stress.py /tmp/sfstop 10
  * --stopwords` — on corpora without planted stopwords, e.g. plain
  * /tmp/sfbig, the sf0.1 vocabulary's hottest term sits below the
  * cutoff and pruning is a structural no-op). */
object Bm25PruneBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfstop")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val probes = docs.filter(col("doc_id") < 10)

    // deterministic fan-out: rows entering the per-(query, doc) sum —
    // the join work the idf cutoff bounds. Computed from one shared
    // index so the two counts differ ONLY by the pruned terms.
    val idx = graft.text.Bm25.buildIndex(docs, "doc_id", "text")
    def fanOut(minIdf: Long): Long = {
      val idfMicro = round(log(lit(1.0) +
        (col("n_docs").cast("double") - col("df") + 0.5d) / (col("df") + 0.5d))
        * 1000000, 0).cast("long")
      val terms = idx.dfreq.crossJoin(broadcast(idx.stats))
        .select(col("term"), idfMicro.as("idf_micro"))
        .filter(col("idf_micro") > minIdf)
      probes
        .select(col("doc_id").as("qid"), explode(array_distinct(
          filter(graft.text.TextAnalysis.tokens(col("text")), t => t =!= "")))
          .as("term"))
        .join(terms, "term").join(idx.postings, "term")
        .filter(col("qid") =!= col("did"))
        .count()
    }
    val fullRows = fanOut(0L)
    val prunedRows = fanOut(graft.text.Bm25.DefaultMinIdfMicro)

    def run(minIdf: Long): (Double, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val out = graft.text.Bm25.topK(probes, docs, "doc_id", "text", k = 5,
          minIdfMicro = minIdf)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val top1 = out.filter(_.getInt(1) == 1)
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      (secs, top1)
    }
    run(0L) // warmup
    // interleave A/B/A/B so cache/JIT drift cannot masquerade as the knob
    val (tFull1, top1Full) = run(0L)
    val (tPruned1, top1Pruned) = run(200000L)
    val (tFull2, _) = run(0L)
    val (tPruned2, _) = run(200000L)
    val agree = top1Full.count { case (q, d) => top1Pruned.get(q).contains(d) }
    println(f"[bm25-prune] scored rows full=$fullRows pruned=$prunedRows " +
      f"(cut ${100.0 * (fullRows - prunedRows) / math.max(fullRows, 1)}%.1f%%) " +
      f"wall full=$tFull1%.2f/$tFull2%.2fs pruned=$tPruned1%.2f/$tPruned2%.2fs " +
      s"top1 agreement $agree/${top1Full.size}")
    spark.stop()
  }
}
