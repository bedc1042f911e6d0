package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[StoreWrite.clusterByDirs]] — the §6 output-file-sizing pass in front
  * of every partitioned serving store. Pins the file-count contract (one
  * parquet file per partition directory at the default `filesPerDir=1`;
  * bounded fan-out when raised) and that the clustered write read back is
  * row-identical to the unclustered frame. */
class StoreWriteSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("default: one file per partition directory, rows preserved") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = graft.text.Bm25.buildIndex(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_swtest").toString
    try {
      graft.text.Bm25.writeIndex(idx, dir)
      val dirs = new java.io.File(s"$dir/postings").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("tbucket="))
      val files = parquetFiles(s"$dir/postings").size
      assert(dirs > 0)
      assert(files == dirs, s"$files files for $dirs directories — " +
        "clusterByDirs should leave exactly one file per directory")
      val back = spark.read.parquet(s"$dir/postings")
        .select(col("did"), col("term"), col("tf"))
      assert(back.exceptAll(idx.postings).isEmpty &&
        idx.postings.exceptAll(back).isEmpty)
    } finally {
      idx.postings.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("filesPerDir=4 bounds the fan-out per directory") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = graft.text.Bm25.buildIndex(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_swtest4").toString
    spark.conf.set(StoreWrite.FilesPerDirConf, "4")
    try {
      graft.text.Bm25.writeIndex(idx, dir)
      val dirFiles = new java.io.File(s"$dir/postings").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("tbucket="))
        .map(d => parquetFiles(d.getPath).size)
      assert(dirFiles.nonEmpty)
      assert(dirFiles.forall(n => n >= 1 && n <= 4),
        s"per-dir file counts ${dirFiles.mkString(",")} exceed filesPerDir=4")
    } finally {
      spark.conf.unset(StoreWrite.FilesPerDirConf)
      idx.postings.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("invalid filesPerDir values fail loudly, naming the conf key") {
    val sp = spark
    import sp.implicits._
    val rows = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    for (bad <- Seq("zero-ish", "0", "-3")) {
      spark.conf.set(StoreWrite.FilesPerDirConf, bad)
      try {
        val e = intercept[IllegalArgumentException] {
          StoreWrite.clusterByDirs(rows, col("k"), col("v")).count()
        }
        assert(e.getMessage.contains(StoreWrite.FilesPerDirConf),
          s"error for '$bad' must name the conf key: ${e.getMessage}")
      } finally spark.conf.unset(StoreWrite.FilesPerDirConf)
    }
  }
}
