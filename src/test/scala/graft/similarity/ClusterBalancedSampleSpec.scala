package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster-balanced curation sample: per-cluster quota, deterministic
  * draw, assignment consistency with the x6-gated assignToCentroids
  * pass, and the quota actually BALANCING a skewed corpus (the property
  * the operator exists for — a uniform sample tracks density, the
  * balanced one does not). */
class ClusterBalancedSampleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("per-cluster quota holds; sample ⊂ corpus; cells match the assignment pass") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cents = Cosine.cellCentroidsSorted(emb, "label", "embedding")
    val out = Cosine.clusterBalancedSample(emb, "vec_id", "embedding",
      cents, "label", m = 3).collect()
    assert(out.nonEmpty)
    val perCell = out.groupBy(_.get(1).toString).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 3), s"quota breached: ${perCell.toMap}")
    // each cell contributes min(m, cluster_n) rows — the quota is filled
    out.groupBy(_.get(1).toString).foreach { case (_, rows) =>
      val n = rows.head.getLong(3)
      assert(rows.length == math.min(3L, n),
        s"cell with $n members contributed ${rows.length} of quota 3")
    }
    // sampled cells agree with the independently-gated assignment pass
    val assigned = Cosine.assignToCentroids(emb, "vec_id", "embedding",
        cents, "label")
      .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
    out.foreach(r => assert(assigned(r.getLong(0)) == r.get(1).toString))
  }

  test("deterministic across runs") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cents = Cosine.cellCentroidsSorted(emb, "label", "embedding")
    def run() = Cosine.clusterBalancedSample(emb, "vec_id", "embedding",
      cents, "label", m = 2).orderBy(col("assigned_cell"), col("vec_id")).collect().toSeq
    assert(run() == run())
  }

  test("the quota balances a skewed corpus where a uniform sample cannot") {
    val sp = spark; import sp.implicits._
    // 2 clusters, 90/10 skew: cell A at (1,0,...), cell B at (0,1,...)
    val dim = 8
    def vec(hot: Int, n: Double) = (0 until dim).map(i => if (i == hot) n.toFloat else 0f).toArray
    val rows = (1L to 90L).map(i => (i, "a", vec(0, 1.0 + (i % 7) * 0.01))) ++
      (91L to 100L).map(i => (i, "b", vec(1, 1.0 + (i % 5) * 0.01)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val cents = Cosine.cellCentroidsSorted(df, "label", "embedding")
    val out = Cosine.clusterBalancedSample(df, "vec_id", "embedding",
      cents, "label", m = 5).collect()
    val byCell = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byCell == Map("a" -> 5, "b" -> 5),
      s"balanced sample must take the quota from BOTH clusters: $byCell")
    assert(out.filter(_.getString(1) == "a").forall(_.getLong(3) == 90L))
  }
}
