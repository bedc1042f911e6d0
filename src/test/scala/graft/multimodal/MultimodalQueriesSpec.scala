package graft.multimodal

import graft.SparkSpec
import graft.queries.MultimodalQueries

/** Pins the m1/m2 gate identities: real codec round trips must land on the
  * closed-form arithmetic the DuckDB oracle computes (the spec re-derives
  * the same formulas in Scala against sf0.001 supplier keys). */
class MultimodalQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("m1: decoded metadata equals the closed form for all three kinds") {
    val rows = MultimodalQueries.queries("m1_media_meta")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.length % 3 == 0)
    rows.foreach { r =>
      val id = r.getLong(0); val k = id / 10
      r.getString(1) match {
        case "image" =>
          assert(r.getString(2) == "png")
          assert(r.getInt(3) == 16 + (k % 17).toInt, s"width for k=$k")
          assert(r.getInt(4) == 9 + (k % 13).toInt, s"height for k=$k")
          assert(r.getInt(7) == 1)
        case "audio" =>
          val rate = 8000 + (k % 8).toInt * 1000
          assert(r.getString(2) == "wav")
          assert(r.getInt(5) == rate)
          assert(r.getLong(6) == (500 + k % 251) * 1000 / rate, s"duration for k=$k")
        case "video" =>
          val fps = 4 + (k % 3).toInt; val nf = 2 + (k % 4).toInt
          assert(r.getString(2) == "avi/mjpeg")
          assert(r.getInt(3) == 12 + (k % 5).toInt * 2)
          assert(r.getInt(4) == 8 + (k % 3).toInt * 2)
          assert(r.getLong(6) == (1000000 / fps).toLong * nf / 1000, s"video duration k=$k")
          assert(r.getInt(7) == nf)
      }
    }
    // no decode fell back to the "error" marker
    assert(rows.forall(_.getString(2) != "error"))
  }

  test("m2: float features invert to the exact generation integers") {
    val rows = MultimodalQueries.queries("m2_media_features")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getLong(0) / 10
      r.getString(1) match {
        case "image" =>
          val lum = ((k % 256) * 299 + ((k * 7) % 256) * 587 +
            ((k * 13) % 256) * 114) / 1000
          assert(r.getInt(2) == lum.toInt, s"luma for k=$k")
        case "audio" =>
          assert(r.getInt(2) == 1000 + (k % 29).toInt * 500, s"amp for k=$k")
      }
    }
  }
}
