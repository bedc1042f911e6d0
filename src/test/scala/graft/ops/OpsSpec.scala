package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def df = {
    val sp = spark; import sp.implicits._
    Seq(("k1", 1, "a"), ("k1", 2, "b"), ("k2", 5, "c"), ("k1", 3, "d"))
      .toDF("key", "seq", "payload")
  }

  test("keepLast keeps highest seq per key") {
    val out = Dedup.keepLast(df, Seq("key"), Seq(col("seq")))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("k1" -> "d", "k2" -> "c"))
  }

  test("keepFirst keeps lowest seq per key") {
    val out = Dedup.keepFirst(df, Seq("key"), Seq(col("seq")))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("k1" -> "a", "k2" -> "c"))
  }

  test("duplicateCount counts surplus rows only") {
    assert(Dedup.duplicateCount(df, Seq("key")) == 2L)
    assert(Dedup.duplicateCount(df.limit(0), Seq("key")) == 0L)
  }
}

class HashDiffSpec extends SparkSpec {

  test("diff classifies new/update/deleted/unchanged") {
    val sp = spark; import sp.implicits._
    val source = Seq(("a", "h1"), ("b", "h2x"), ("d", "h4"))
      .toDF("id", "__hash")
    val target = Seq(("a", "h1", "active"), ("b", "h2", "active"),
      ("c", "h3", "active"), ("e", "h5", "inactive"))
      .toDF("id", "__hash", "status")
    val out = HashDiff.diff(source, target, Seq("id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "unchanged", "b" -> "update", "c" -> "deleted", "d" -> "new",
      "e" -> "unchanged")) // already-inactive rows are not re-deleted
  }

  test("softDeleteSweep flips vanished keys to inactive") {
    val sp = spark; import sp.implicits._
    val current = Seq(("a", "active"), ("b", "active")).toDF("id", "status")
    val incoming = Seq(Tuple1("a")).toDF("id")
    val out = HashDiff.softDeleteSweep(current, incoming, Seq("id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "active", "b" -> "inactive"))
  }

  test("tableHash emits python-parity key and hash columns") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "x", 2.5, "2026-01-01")).toDF("id", "name", "v", "observed_at")
    val row = CanonicalJson.tableHash(df, Seq("id")).collect().head
    assert(row.getAs[String]("__key") == """{"id": 1}""")
    // hash excludes PK and observed_at
    val expected = CanonicalJson.sha1Hex("""{"name": "x", "v": 2.5}""")
    assert(row.getAs[String]("__hash") == expected)
  }

  test("table and database digests match the CPython reference algorithm") {
    val sp = spark; import sp.implicits._
    // expected hex computed by CPython: sha1 of json.dumps(sort_keys=True)
    // of {row_key: row_hash} per table, then of {table: digest}
    val t1 = Seq((1L, "aa", 1.5), (2L, "bb", 2.0)).toDF("id", "name", "price")
    val t2 = Seq(("x", 7L)).toDF("code", "qty")
    val t3 = Seq((9L, "zz")).toDF("k", "v")
    assert(HashDiff.tableDigest(t1, Seq("id")) ==
      "0bd6ebc54dad67ff30c12faf0dd271357d41ed48")
    assert(HashDiff.tableDigest(t2, Seq("code")) ==
      "d1f606dec4e78d58c8b8fe6b6ae1a01ab7ba39e0")
    val tables = Map(
      "t1" -> (t1, Seq("id")), "t2" -> (t2, Seq("code")), "t3" -> (t3, Seq("k")))
    assert(HashDiff.databaseHash(tables) ==
      "56504150f66256b41c5c9cff4df8c24de576a23c")
    // E4: excluded tables drop out of the database digest
    assert(HashDiff.databaseHash(tables, exclude = Set("t3")) ==
      "f4918d132ed49fa52ad2bccadab3a3f8ec0ce2b9")
  }
}
