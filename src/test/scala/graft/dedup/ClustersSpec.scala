package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {

  test("connected components label chains and triangles to the min id") {
    val sp = spark; import sp.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val out = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components agree with driver-side union-find on random graphs") {
    val sp = spark; import sp.implicits._
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      // sparse random graph: long chains and small cycles both occur
      val edges = (1 to 150).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val parent = scala.collection.mutable.Map((0L until 80L).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap
      val got = Clusters.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("large-star/small-star agrees with propagation and union-find on random graphs") {
    val sp = spark; import sp.implicits._
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(300 + seed)
      val edges = (1 to 150).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val parent = scala.collection.mutable.Map((0L until 80L).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap
      val got = Clusters.connectedComponentsLSS(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("large-star/small-star handles a deep chain in logarithmic rounds") {
    val sp = spark; import sp.implicits._
    // a 120-link chain: propagation would need ~120 rounds (over its
    // 50-round budget); star contraction collapses it in a handful
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Clusters.connectedComponentsLSS(chain, maxIterations = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 121 && out.values.forall(_ == 0L))
  }

  test("dedupPlan keeps one representative per cluster, singletons keep themselves") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 6L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Clusters.dedupPlan(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (4L, 4L, true), (5L, 4L, false), (6L, 6L, true)))
    // dedup rate: 6 docs -> 4 kept
    assert(out.count(_._3) == 4)
  }

  test("appendLabels ≡ full rebuild: cross-wave merges, attachments, untouched singletons") {
    val sp = spark; import sp.implicits._
    // old snapshot: components {1,2,3} (root 1), {10,11} (root 10),
    // {20,21} (root 20), plus a dedupPlan-style singleton row 30 -> 30
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val stored = Clusters.connectedComponentsAdaptive(oldPairs)
      .unionByName(Seq((30L, 30L)).toDF("id", "cluster_id"))
    // new wave: 50 attaches to {10,11}; (3,11) MERGES two old components
    // (the min must re-propagate to 1 across the star boundary); 60-61 is
    // a brand-new component; 30 stays untouched
    val newPairs = Seq((50L, 11L), (3L, 11L), (60L, 61L)).toDF("id_a", "id_b")
    val got = Clusters.appendLabels(stored, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuild = Clusters.connectedComponentsAdaptive(
        oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == rebuild + (30L -> 30L), s"append drifted: $got vs $rebuild")
    // the merged component's label is the OLD global minimum
    assert(got(50L) == 1L && got(11L) == 1L && got(10L) == 1L)
    assert(got(20L) == 20L && got(21L) == 20L) // untouched cluster verbatim
    assert(got(30L) == 30L)                    // untouched singleton survives
    assert(got(60L) == 60L && got(61L) == 60L) // new-only component
  }

  test("appendLabels ≡ full rebuild on random graphs split into waves") {
    val sp = spark; import sp.implicits._
    (0 until 2).foreach { seed =>
      val rnd = new scala.util.Random(700 + seed)
      val edges = (1 to 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // wave split by edge hash — both endpoints' history stays mixed, so
      // merges across the boundary are guaranteed at this density
      val (oldE, newE) = edges.partition { case (a, b) => (a * 31 + b) % 3 != 0 }
      val stored = Clusters.connectedComponentsAdaptive(oldE.toDF("id_a", "id_b"))
      val got = Clusters.appendLabels(stored, newE.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rebuild = Clusters.connectedComponentsAdaptive(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == rebuild, s"seed=$seed")
    }
  }

  test("quality keep rule survives the BEST copy, not the smallest id") {
    val sp = spark; import sp.implicits._
    // cluster {1,2,3}: doc 2 has the highest quality — min-id would keep 1
    val docs = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (4L, 0.5))
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Clusters.dedupPlanByQuality(docs, "doc_id", "quality", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(2L) == ((2L, true)), s"best copy not kept: $out")
    assert(out(1L) == ((2L, false)) && out(3L) == ((2L, false))) // tie → min id among 0.9s
    assert(out(4L) == ((4L, true))) // singleton keeps itself
  }
}
