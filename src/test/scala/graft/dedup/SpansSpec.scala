package graft.dedup

import graft.SparkSpec

class SpansSpec extends SparkSpec {

  // crafted corpus, k=3:
  //  - doc 1 shares "a b c" and "e f g" with doc 2, separated by a gap of
  //    unique tokens → TWO islands per doc
  //  - doc 3 repeats "r s t u" WITHIN itself — within-doc repeats count,
  //    and the overlapping/adjacent starts merge to one maximal span
  //  - doc 4 has no duplicated 3-gram (and a double space whose empty
  //    token must drop from the position space)
  private def corpus = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "a b c G1 G2 G3 G4 e f g"),
      (2L, "p a b c q e f g"),
      (3L, "r s t u r s t u"),
      (4L, "solo  tokens only here nothing repeats ever"))
      .toDF("doc_id", "text")
  }

  test("duplicate spans: cross-doc, within-doc, island merge, rollup") {
    val out = Spans.duplicateSpans(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // doc 4 clean → absent
    assert(out(1L) == ((2L, 6L, 10L, 0.6)))  // [0,3) + [7,10) of 10 tokens
    assert(out(2L) == ((2L, 6L, 8L, 0.75))) // [1,4) + [5,8) of 8 tokens
    assert(out(3L) == ((1L, 8L, 8L, 1.0)))  // starts 0,1,4,5 all merge
  }

  test("span list emits the maximal merged intervals") {
    val spans = Spans.spanList(corpus, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set(
      (1L, 0, 3), (1L, 7, 10),
      (2L, 1, 4), (2L, 5, 8),
      (3L, 0, 8)))
  }

  test("cleanText cuts merged spans and passes clean docs through") {
    val out = Spans.cleanText(corpus, "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // ALL docs come back
    assert(out(1L) == (("G1 G2 G3 G4", 4L, 6L)))
    assert(out(2L) == (("p q", 2L, 6L)))
    assert(out(3L) == (("", 0L, 8L))) // fully duplicated doc → empty
    // doc 4 is clean; double space normalizes to single
    assert(out(4L) == (("solo tokens only here nothing repeats ever", 7L, 0L)))
  }

  test("property sweep: spans match a brute-force reference on random corpora") {
    val sp = spark; import sp.implicits._
    val next = seededInts(41L)
    (1 to 5).foreach { round =>
      val k = 2 + next(3) // 2..4
      // small vocab forces plenty of repeated k-grams
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      val docs = (0 until 8).map { id =>
        val n = next(15) // 0..14 tokens; includes docs shorter than k
        (id.toLong, (0 until n).map(_ => vocab(next(vocab.size))).mkString(" "))
      }
      // brute force: every k-window text → global count; spans from
      // per-doc duplicated starts merged with the same within-k rule
      val windows = docs.flatMap { case (id, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        (0 to t.length - k).filter(_ => t.length >= k)
          .map(i => (id, i, t.slice(i, i + k).mkString(" ")))
      }
      val dupTexts = windows.groupBy(_._3).filter(_._2.size > 1).keySet
      val expected = windows.filter(w => dupTexts(w._3))
        .groupBy(_._1).view.mapValues { ws =>
          val starts = ws.map(_._2).sorted
          starts.tail.foldLeft(List((starts.head, starts.head + k))) {
            case ((s, e) :: rest, p) =>
              if (p <= (e - k) + k) (s, math.max(e, p + k)) :: rest
              else (p, p + k) :: (s, e) :: rest
            case (Nil, p) => List((p, p + k))
          }.reverse
        }.toMap
      val got = Spans.spanList(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toList).toMap
      assert(got == expected.map { case (id, v) => id -> v.sorted },
        s"round=$round k=$k docs=$docs")
    }
  }

  test("hashed-key default is row-identical to the string-key oracle form") {
    // real corpus (sf0.001 documents) — the configuration claim at
    // Spans.scala's scaladoc: xxhash64 fingerprint keys change ONLY the
    // shuffle width, never a value. Pins all three surfaces.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val hashedSpans = rows(Spans.duplicateSpans(docs, "doc_id", "text", k = 5))
    // non-vacuity: the parity claim only has teeth if the corpus actually
    // contains duplicated spans (empty == empty would pass trivially)
    assert(hashedSpans.nonEmpty,
      "sf0.001 documents corpus produced no duplicated spans — parity test is vacuous")
    assert(hashedSpans ==
      rows(Spans.duplicateSpans(docs, "doc_id", "text", k = 5, hashedKeys = false)))
    assert(rows(Spans.spanList(docs, "doc_id", "text", k = 5)) ==
      rows(Spans.spanList(docs, "doc_id", "text", k = 5, hashedKeys = false)))
    assert(rows(Spans.cleanText(docs, "doc_id", "text", k = 5)) ==
      rows(Spans.cleanText(docs, "doc_id", "text", k = 5, hashedKeys = false)))
  }

  test("documents shorter than k produce no shingles and no spans") {
    val sp = spark; import sp.implicits._
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(Spans.duplicateSpans(tiny, "doc_id", "text", k = 3).count() == 0)
  }
}
