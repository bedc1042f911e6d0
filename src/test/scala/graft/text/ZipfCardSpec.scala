package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZipfCardSpec extends SparkSpec {

  private def card(texts: Seq[String]) = {
    val sp = spark; import sp.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextAnalysis.zipfCard(docs, "doc_id", "text").head
  }

  test("a planted 1/r frequency corpus measures a slope near -1") {
    // token w_r appears floor(600/r) times, r = 1..80 — exact Zipf
    val words = (1 to 80).flatMap(r => Seq.fill(600 / r)(f"w$r%03d"))
    val c = card(Seq(words.mkString(" ")))
    val slope = c.getDouble(3)
    assert(math.abs(slope - (-1.0)) < 0.15, s"slope $slope not Zipf-like")
    assert(c.getLong(0) == 80 && c.getLong(1) == words.length)
  }

  test("a uniform corpus measures a slope near 0 — the non-natural flag") {
    val words = (1 to 80).flatMap(r => Seq.fill(40)(f"u$r%03d"))
    val slope = card(Seq(words.mkString(" "))).getDouble(3)
    assert(math.abs(slope) < 0.1, s"uniform corpus scored $slope")
  }

  test("hand-checked totals and top share") {
    // a:3 b:2 c:1 -> vocab 3, total 6, top_share 0.5
    val c = card(Seq("a a a b b c"))
    assert(c.getLong(0) == 3 && c.getLong(1) == 6)
    assert(c.getDouble(2) == 0.5)
    // slope replication via the same milli-nat integer least squares
    def milli(v: Double) =
      BigDecimal(v * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val pts = Seq((1L, 3L), (2L, 2L), (3L, 1L))
      .map { case (r, n) => (milli(math.log(r.toDouble)), milli(math.log(n.toDouble))) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val want = BigDecimal(
        (3.0 * sxy - sx.toDouble * sy) / (3.0 * sxx - sx.toDouble * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(c.getDouble(3) == want, s"${c.getDouble(3)} != $want")
  }
}
