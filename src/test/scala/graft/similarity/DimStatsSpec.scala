package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimStatsSpec extends SparkSpec {

  private def vecs = {
    val sp = spark; import sp.implicits._
    // dim 1: values 1,2,3 (mean 2, pop-var 2/3); dim 2: constant 5;
    // dim 3: -1, 0, 1
    Seq((1L, Seq(1.0f, 5.0f, -1.0f)), (2L, Seq(2.0f, 5.0f, 0.0f)),
      (3L, Seq(3.0f, 5.0f, 1.0f))).toDF("vec_id", "embedding")
  }

  test("hand-computed per-dimension stats") {
    val out = Cosine.dimStats(vecs, "embedding", sorted = true)
      .orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out(0) == ((1L, 3L, 2.0, 0.816497, 1.0, 3.0)), out(0).toString)
    assert(out(1) == ((2L, 3L, 5.0, 0.0, 5.0, 5.0)), out(1).toString)
    assert(out(2) == ((3L, 3L, 0.0, 0.816497, -1.0, 1.0)), out(2).toString)
  }

  test("plain-avg default agrees with the sorted-fold gate path after rounding") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Cosine.dimStats(emb, "embedding").orderBy("dim").collect()
    val b = Cosine.dimStats(emb, "embedding", sorted = true).orderBy("dim").collect()
    assert(a.length == 64 && a.toSeq == b.toSeq)
  }

  test("a collapsed dimension is visible as zero stddev") {
    val sp = spark; import sp.implicits._
    val collapsed = Seq((1L, Seq(0.3f, 7.0f)), (2L, Seq(0.9f, 7.0f)))
      .toDF("vec_id", "embedding")
    val sd = Cosine.dimStats(collapsed, "embedding")
      .filter(col("dim") === 2).head.getDouble(3)
    assert(sd == 0.0)
  }
}
