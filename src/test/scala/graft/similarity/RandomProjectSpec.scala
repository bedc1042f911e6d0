package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectSpec extends SparkSpec {

  /** Deterministic pseudo-random unit-ish vectors (sha1-derived, so the
    * spec's measured distortion numbers are stable forever). */
  private def vec(id: Int, dim: Int = 64): Array[Float] =
    Array.tabulate(dim) { j =>
      val hex = graft.ops.CanonicalJson.sha1Hex(s"rp:$id:$j").substring(0, 8)
      (((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0).toFloat
    }

  private def frame(rows: Seq[(Long, Array[Float])]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("projection matches the closed-form plane dot products") {
    val v = vec(1)
    val out = Cosine.randomProject(frame(Seq(1L -> v)), "vec_id", "embedding",
        outDim = 4, dim = 64)
      .select(explode(col("proj"))).collect().map(_.getDouble(0))
    val expected = Cosine.hyperplanesSeeded(0, 4, 64).map { h =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += v(i).toDouble * h(i); i += 1 }
      acc
    }
    assert(out.toSeq == expected, s"${out.toSeq} vs $expected")
  }

  test("identical vectors project identically - projected-space dedup is sound") {
    val out = Cosine.randomProject(frame(Seq(1L -> vec(7), 2L -> vec(7), 3L -> vec(8))),
        "vec_id", "embedding", outDim = 16, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("JL property: projected cosine tracks true cosine on 200 pairs") {
    val rows = (0 until 200).map(i => i.toLong -> vec(i))
    val df = frame(rows)
    val proj = Cosine.randomProject(df, "vec_id", "embedding", outDim = 16, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val errs = (0 until 100).map { i =>
      val a = rows(2 * i)._2.map(_.toDouble)
      val b = rows(2 * i + 1)._2.map(_.toDouble)
      math.abs(cos(a, b) - cos(proj(2L * i), proj(2L * i + 1)))
    }
    // deterministic data + planes → stable measured distortion; JL at
    // outDim=16 predicts σ≈1/√16=0.25 per pair
    val mean = errs.sum / errs.size
    assert(mean < 0.25, s"mean |cos error| $mean exceeds the JL envelope")
    assert(errs.count(_ < 0.5).toDouble / errs.size >= 0.9, // measured: 0.94
      s"too many pairs outside 0.5: ${errs.count(_ >= 0.5)}")
  }
}
