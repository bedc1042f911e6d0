package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per JVM; small shuffle fan-out). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark

  /** Deterministic pseudo-random int stream for property-style sweeps
    * (the scalatest-scalacheck bridge is not on the offline classpath).
    * One shared LCG so specs don't grow drifting copies. */
  def seededInts(seed: Long): Int => Int = {
    var s = seed
    bound => {
      s = s * 6364136223846793005L + 1442695040888963407L
      (math.abs(s >> 33) % bound).toInt
    }
  }
}
