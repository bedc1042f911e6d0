package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: code shape/determinism, codebook structure, ADC
  * retrieval quality on separable clusters, and the avg-vs-sorted-fold
  * codebook decision parity. */
class PqSpec extends SparkSpec {

  // 3 well-separated clusters on orthogonal axes in 64-dim space: members
  // of cluster c point along axis 8c with small deterministic jitter on a
  // DIFFERENT axis, so within-cluster cosine ~1, cross-cluster ~0
  private def clustered = {
    val sp = spark; import sp.implicits._
    val rows = for {
      c <- 0 until 3
      m <- 0 until 6
    } yield {
      val v = Array.fill(64)(0.0f)
      v(c * 8) = 1.0f
      v(c * 8 + 4) = 0.05f * m
      (c * 100L + m, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codes are deterministic, bounded, and identical for identical vectors") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, Seq.fill(64)(0.5f)), (2L, Seq.fill(64)(0.5f)),
      (3L, (0 until 64).map(i => i.toFloat / 64)))
      .toDF("vec_id", "embedding")
    val out = Cosine.pqCodes(docs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val codes = out.map(_.getSeq[Long](1))
    assert(codes.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
    assert(codes(0) == codes(1), "identical vectors must get identical codes")
    // and a second run gives the same bytes (pure function of the vector)
    val again = Cosine.pqCodes(docs, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.getSeq[Long](1))
    assert(codes.toSeq == again.toSeq)
  }

  test("codebook has one row per (subspace, occupied code) and dim; values rounded") {
    val book = Cosine.pqCodebook(clustered, "vec_id", "embedding").collect()
    // every cell key decomposes to subspace 0..7, code 0..15, dims 1..8
    assert(book.nonEmpty)
    book.foreach { r =>
      val cell = r.getLong(0); val dim = r.getLong(1)
      assert(cell >= 0 && cell < 8 * 16 && dim >= 1 && dim <= 8, r.toString)
    }
    assert(book.map(r => (r.getLong(0), r.getLong(1))).distinct.length == book.length)
  }

  test("ADC retrieves same-cluster neighbors on separable clusters") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") % 100 === 0) // member 0 of each cluster
    val top = Cosine.pqAdcTopK(queries, corpus, "vec_id", "embedding", k = 3)
      .collect()
    assert(top.nonEmpty)
    // every retrieved neighbor at rank 1 belongs to the query's cluster
    top.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getLong(0) / 100 == r.getLong(2) / 100,
        s"rank-1 neighbor crosses clusters: $r")
    }
  }

  test("IVFADC: cell pruning bounds candidates, ADC scores them") {
    val labeled = clustered.withColumn("label",
      (col("vec_id") / 100).cast("int"))
    val queries = labeled.filter(col("vec_id") % 100 === 0)
    val top = Cosine.ivfAdcTopK(queries, labeled, "vec_id", "embedding",
      "label", k = 3).collect()
    assert(top.nonEmpty)
    // the cell join admits only same-cell candidates by construction —
    // every retrieved neighbor shares the query's cluster at every rank
    top.foreach { r =>
      assert(r.getLong(0) / 100 == r.getLong(2) / 100, r.toString)
    }
  }

  test("plain-avg and sorted-fold codebooks agree after rounding on this corpus") {
    val a = Cosine.pqCodebook(clustered, "vec_id", "embedding",
      centroidFn = Cosine.cellCentroids).orderBy("cell", "dim").collect()
    val b = Cosine.pqCodebook(clustered, "vec_id", "embedding",
      centroidFn = Cosine.cellCentroidsSorted).orderBy("cell", "dim").collect()
    assert(a.toSeq == b.toSeq)
  }
}
