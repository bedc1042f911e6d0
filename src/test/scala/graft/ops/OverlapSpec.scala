package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[Overlap.map]] — the §2.6 independent-job overlap helper behind
  * PartitionSample's guard probes and the x28b/x28c recall-curve
  * harness. Pins the two properties callers lean on: result ORDER
  * follows input order no matter how the bodies interleave, and a body
  * failure propagates instead of vanishing into the pool. */
class OverlapSpec extends AnyFunSuite {

  test("results come back in input order under concurrent execution") {
    // reverse-staggered sleeps: the LAST input finishes first, so an
    // implementation collecting by completion order would reverse them
    val xs = (1 to 8).toSeq
    val out = Overlap.map(xs) { i => Thread.sleep((8 - i) * 30L); i * 10 }
    assert(out == xs.map(_ * 10))
  }

  test("a throwing body propagates to the caller") {
    val e = intercept[RuntimeException] {
      Overlap.map(Seq(1, 2, 3)) { i =>
        if (i == 2) throw new RuntimeException("boom") else i
      }
    }
    assert(e.getMessage == "boom")
  }

  test("single-element and empty inputs run inline") {
    assert(Overlap.map(Seq(7))(_ + 1) == Seq(8))
    assert(Overlap.map(Seq.empty[Int])(_ + 1).isEmpty)
  }
}
