package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the stored PQ/IVFADC tier (the StoredServingProbe
  * pattern): runtime scan metrics — partitions/files/bytes actually read —
  * for a 1-query own-cell probe through `ivfAdcSearchStored` versus the
  * unpruned in-plan `ivfAdcTopK`, plus the code-store vs raw-vector size
  * ratio (the 4 B/dim story). Numbers land in SCALE.md.
  * Run: sbt 'Test/runMain graft.PqStoredProbe /root/testdata/sf0.1' */
object PqStoredProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"CORPUS vectors=${emb.count()} cells=${emb.select(col("label")).distinct().count()}")
    val tmp = java.nio.file.Files.createTempDirectory("pqprobe").toString
    graft.similarity.Cosine.writePqIndex(emb,
      emb.select(col("vec_id"), col("label")), "vec_id", "embedding",
      "label", tmp, centroidFn = graft.similarity.Cosine.cellCentroidsSorted)
    def duDir(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    println(s"BYTES codes=${duDir(s"$tmp/codes")} vectors=${duDir(s"$tmp/vectors")} " +
      s"codebook=${duDir(s"$tmp/codebook")}")
    def scans(p: org.apache.spark.sql.execution.SparkPlan) = PlanWalk.scans(p)
    def report(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      scans(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.exists(_.toString.contains(tmp)))
        .foreach { f =>
          def v(k: String): String = f.metrics.get(k).map(_.value.toString).getOrElse("-")
          val p = f.relation.location.rootPaths.head.toString
            .replace(tmp, "").takeWhile(_ != '=')
          println(s"$tag SCAN $p partitions=${v("numPartitions")} files=${v("numFiles")} " +
            s"rows=${v("numOutputRows")}")
        }
      println(f"$tag hits=$n sec=$sec%.2f")
    }
    val q1 = emb.filter(col("vec_id") === 3)
    report("STORED_1Q", graft.similarity.Cosine.ivfAdcSearchStored(spark, q1,
      tmp, "vec_id", "embedding", "label", k = 5))
    report("TWOSTAGE_1Q", graft.similarity.Cosine.pqTopKStored(spark, q1,
      tmp, "vec_id", "embedding", k = 5, kShort = 20))
    val t0 = System.nanoTime()
    val n = graft.similarity.Cosine.ivfAdcTopK(q1, emb, "vec_id", "embedding",
      "label", k = 5, centroidFn = graft.similarity.Cosine.cellCentroidsSorted)
      .collect().length
    println(f"INPLAN_1Q hits=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
