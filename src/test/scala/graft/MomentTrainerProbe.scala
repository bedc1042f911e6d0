package graft

/** Wall-clock probe for the second-moment trainer pass (run for the
  * SCALE.md row): [[graft.plans.MomentSumAgg]] (one dim²+1 double buffer
  * per partition) vs the posexplode formulation it replaced (dim²+1
  * Catalyst rows PER VECTOR map-side before the combine), on a synthetic
  * corpus at dim ≥ 512 where the per-row blow-up actually binds. Also
  * asserts the two passes agree to summation-order rounding — the swap
  * is a pure execution-strategy change.
  * Run: sbt 'Test/runMain graft.MomentTrainerProbe [dim] [nRows]' */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MomentTrainerProbe {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(512)
    val n = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic synthetic corpus: xxhash64-derived doubles in [-1, 1]
    val corpus = spark.range(n.toLong).select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i), lit(2000001L)) - 1000000L)
            .cast("double") / 1000000.0d).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    val agg = time(s"MomentSumAgg dim=$dim n=$n") {
      corpus.select(graft.plans.MomentSumAgg.momentSum(col("v")).as("m"))
        .head().getSeq[Double](0)
    }
    val exploded = time(s"posexplode   dim=$dim n=$n") {
      corpus.select(posexplode(concat(array(lit(1.0d)),
          flatten(transform(col("v"), x => transform(col("v"), y => x * y)))))
          .as(Seq("pos", "x")))
        .groupBy(col("pos")).agg(sum(col("x")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    require(agg.size == exploded.size, s"${agg.size} vs ${exploded.size}")
    val maxRel = agg.indices.map { i =>
      val w = exploded(i)
      math.abs(agg(i) - w) / math.max(1.0, math.abs(w))
    }.max
    println(f"max relative diff: $maxRel%.2e (summation-order rounding only)")
    require(maxRel < 1e-9, s"trainer passes disagree: $maxRel")
    spark.stop()
  }
}
