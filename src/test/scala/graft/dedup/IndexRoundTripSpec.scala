package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cross-snapshot dedup index survives storage: a snapshot's band
  * index written to parquet and read back yields decision-identical
  * results to the fresh computation — the configuration the scale story
  * promises ("dedup a daily batch against the stored index without
  * touching the snapshot's text again"). */
class IndexRoundTripSpec extends SparkSpec {

  test("parquet round trip of the snapshot index is decision-identical") {
    val sp = spark; import sp.implicits._
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "an entirely different sentence about catalyst plans and shuffles here"),
      (3L, "one more unrelated document talking about parquet files and buckets"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank forever"),
      (11L, "novel content with no counterpart in the prior snapshot whatsoever"))
      .toDF("doc_id", "text")

    val fresh = MinHash.nearDuplicatesAgainst(batch, old, "doc_id", "text",
      n = 2, threshold = 0.5).orderBy("id_new", "id_old").collect().toSeq
    assert(fresh.nonEmpty, "fixture must produce at least one cross-snapshot dup")

    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    try {
      val sharr = MinHash.hashedShingleArray(old, "doc_id", "text", 2)
      MinHash.snapshotIndex(sharr, "doc_id").write.mode("overwrite").parquet(dir)
      // a new session day: only the stored index is available
      val stored = spark.read.parquet(dir)
      val viaIndex = MinHash.nearDuplicatesAgainstIndex(batch, stored,
        "doc_id", "text", n = 2, threshold = 0.5)
        .orderBy("id_new", "id_old").collect().toSeq
      assert(viaIndex == fresh, s"stored-index path diverged: $viaIndex vs $fresh")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("IVF centroid table round-trips through parquet: assignment identical") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = graft.similarity.Cosine.cellCentroidsSorted(emb, "label", "embedding")
    val fresh = graft.similarity.Cosine.assignToCentroids(
      emb, "vec_id", "embedding", cents, "label").orderBy("vec_id").collect().toSeq
    assert(fresh.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      cents.write.mode("overwrite").parquet(dir)
      val stored = spark.read.parquet(dir)
      val viaStore = graft.similarity.Cosine.assignToCentroids(
        emb, "vec_id", "embedding", stored, "label").orderBy("vec_id").collect().toSeq
      assert(viaStore == fresh, "stored-centroid assignment diverged")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
