package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkWindowsSpec extends SparkSpec {

  private def chunksOf(text: String, size: Int, stride: Int) = {
    val sp = spark; import sp.implicits._
    TextAnalysis.chunkWindows(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, stride)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
  }

  test("hand-checked windows: size 4, stride 2 over 10 tokens") {
    val out = chunksOf("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", 4, 2)
    assert(out.toSeq == Seq(
      (0L, "t0 t1 t2 t3", 4L), (1L, "t2 t3 t4 t5", 4L),
      (2L, "t4 t5 t6 t7", 4L), (3L, "t6 t7 t8 t9", 4L)))
  }

  test("tail window is partial; every token is covered; overlap is size-stride") {
    val out = chunksOf("a b c d e f g", 3, 2) // 7 tokens
    assert(out.toSeq == Seq(
      (0L, "a b c", 3L), (1L, "c d e", 3L), (2L, "e f g", 3L)))
    val out2 = chunksOf("a b c d e f g h", 3, 2) // 8 tokens -> partial tail
    assert(out2.last == (3L, "g h", 2L), s"${out2.toSeq}")
    // coverage: the union of [i*stride, i*stride+size) spans all tokens
    assert(out2.map(_._3).sum >= 8)
  }

  test("stride == size reassembles the document exactly") {
    val text = (0 until 23).map(i => s"w$i").mkString(" ")
    val out = chunksOf(text, 5, 5)
    assert(out.map(_._2).mkString(" ") == text)
    assert(out.map(_._3).sum == 23)
  }

  test("short and empty docs produce exactly one window") {
    assert(chunksOf("only two", 64, 48).toSeq == Seq((0L, "only two", 2L)))
    // the tokenizer's empty-text artifact: one empty token, one chunk
    assert(chunksOf("", 64, 48).toSeq == Seq((0L, "", 1L)))
  }
}
