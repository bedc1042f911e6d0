package graft.plans

import graft.SparkSpec
import graft.ops.CanonicalJson
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("canonical_json native expression matches the reference serializer") {
    GraftExtensions.register(spark)
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "x", 2.5)).toDF("id", "name", "v")
    val out = df.select(expr("canonical_json(struct(v, id, name))").as("j"))
      .collect().head.getString(0)
    // keys sorted, dumps separators, python float repr
    assert(out == """{"id": 1, "name": "x", "v": 2.5}""")
  }

  test("canonical_row_hash equals sha1 of canonical json") {
    GraftExtensions.register(spark)
    val sp = spark; import sp.implicits._
    val df = Seq((7L, "abc")).toDF("id", "s")
    val h = df.select(expr("canonical_row_hash(struct(id, s))").as("h"))
      .collect().head.getString(0)
    assert(h == CanonicalJson.sha1Hex("""{"id": 7, "s": "abc"}"""))
  }

  test("nested arrays, maps, nulls and unicode serialize python-style") {
    GraftExtensions.register(spark)
    val sp = spark; import sp.implicits._
    val df = Seq((Seq(1.0, 2.5), Map("b" -> "é", "a" -> "x"), null.asInstanceOf[String]))
      .toDF("arr", "m", "s")
    val out = df.select(expr("canonical_json(struct(arr, m, s))")).collect().head.getString(0)
    assert(out == "{\"arr\": [1.0, 2.5], \"m\": {\"a\": \"x\", \"b\": \"\\u00e9\"}, \"s\": null}")
  }

  test("native expression agrees with the UDF path on table rows") {
    GraftExtensions.register(spark)
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.0)).toDF("id", "name", "v")
    val viaUdf = df.select(CanonicalJson.canonical(
      Seq("id" -> col("id"), "name" -> col("name"), "v" -> col("v"))).as("j"))
    val viaExpr = df.select(expr("canonical_json(struct(id, name, v))").as("j"))
    assert(viaUdf.collect().map(_.getString(0)).toSeq ==
      viaExpr.collect().map(_.getString(0)).toSeq)
  }
}
