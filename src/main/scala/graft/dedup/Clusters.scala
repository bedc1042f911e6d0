package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER dedup: pair detection (Jaccard/LSH/SimHash)
  * yields edges; true dedup keeps ONE representative per connected
  * component of the near-dup graph, not one per pair. Components are
  * computed by min-label propagation to a fixpoint — near-dup clusters
  * have tiny diameters, so convergence takes a couple of iterations; the
  * driver loop only checks a changed-count per round (the data stays
  * distributed). For adversarially-deep graphs at extreme scale the same
  * loop structure hosts the large-star/small-star variant. */
object Clusters {

  /** (id, cluster_id) for every node appearing in `pairs`; cluster_id is
    * the minimum id in the node's connected component. */
  def connectedComponents(pairs: DataFrame, colA: String = "id_a", colB: String = "id_b",
                          maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col(colA).as("src"), col(colB).as("dst"))
      .unionByName(pairs.select(col(colB).as("src"), col(colA).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // each node adopts the min label among itself and its neighbors
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("cluster_id"))
      val next = labels.unionByName(viaNeighbors)
        .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"), "id")
        .filter(col("cluster_id") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist(blocking = false)
    labels
  }

  /** Full dedup decision frame: every document with its cluster id (its
    * own id when it has no near-dup) and a keep flag for the cluster
    * representative (minimum id). */
  def dedupPlan(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }
}
