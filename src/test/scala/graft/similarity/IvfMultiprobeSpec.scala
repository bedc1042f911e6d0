package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IvfMultiprobeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def recallVsExact(approx: DataFrame, exact: DataFrame): Double = {
    val hit = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    hit.toDouble / exact.count()
  }

  test("multiprobe recall is monotone in nProbe and reaches brute force") {
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Cosine.topK(queries, emb, "vec_id", "embedding", k = 5)
    val single = Cosine.ivfTopK(queries, emb, "vec_id", "embedding", "label", k = 5)
    val probe3 = Cosine.ivfTopKMultiprobe(queries, emb, "vec_id", "embedding",
      "label", k = 5, nProbe = 3)
    val nCells = emb.select(col("label")).distinct().count().toInt
    val probeAll = Cosine.ivfTopKMultiprobe(queries, emb, "vec_id", "embedding",
      "label", k = 5, nProbe = nCells)
    val r1 = recallVsExact(single, exact)
    val r3 = recallVsExact(probe3, exact)
    val rAll = recallVsExact(probeAll, exact)
    assert(r3 >= r1, s"recall fell when probing more cells: 1-probe $r1, 3-probe $r3")
    assert(rAll == 1.0, s"probing every cell must equal brute force, recall $rAll")
    // and with every cell probed the ranked lists match exactly
    assert(probeAll.exceptAll(exact).isEmpty && exact.exceptAll(probeAll).isEmpty)
  }

  test("nProbe=1 equals the single-cell ivfTopK when the home cell is nearest") {
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    // the probe rule picks the NEAREST centroid, which can differ from the
    // stored label; restrict to queries whose assigned cell == label, where
    // the two operators must agree row-for-row
    val assign = Cosine.assignToCentroids(emb, "vec_id", "embedding",
      Cosine.cellCentroids(emb.select(col("label"),
        Cosine.toDouble(col("embedding")).as("v")), "label", "v"), "label")
    val stable = assign.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("assigned_cell") === col("label"))
      .select(col("vec_id"))
    val qStable = queries.join(stable, "vec_id")
    val a = Cosine.ivfTopKMultiprobe(qStable, emb, "vec_id", "embedding",
      "label", k = 5, nProbe = 1)
    val b = Cosine.ivfTopK(qStable, emb, "vec_id", "embedding", "label", k = 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
