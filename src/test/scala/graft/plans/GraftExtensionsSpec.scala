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

  test("simhash is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    val sp = spark; import sp.implicits._
    val df = Seq(Tuple1(Seq(3L, 5L, 3L, 9L))).toDF("th")
    val viaSql = df.select(expr("simhash(th)").as("fp")).head.getLong(0)
    val viaCol = df.select(Exprs.toColumn(
      SimHashExpr(Exprs.toExpression(col("th")))).as("fp")).head.getLong(0)
    assert(viaSql == viaCol)
    // bits arg must be a literal
    assertThrows[Exception](df.select(expr("simhash(th, th[0])")).head)
  }

  test("kmv_distinct is callable from SQL as a grouped aggregate") {
    GraftExtensions.register(spark)
    val sp = spark; import sp.implicits._
    val df = (1 to 300).map(i => ("g" + (i % 2), i.toLong * 1000003L)).toDF("g", "h")
    df.createOrReplaceTempView("kmv_in")
    val viaSql = sp.sql(
      "SELECT g, kmv_distinct(h, 8) AS est FROM kmv_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val viaCol = df.groupBy("g").agg(KmvSketchAgg.kmvDistinct(col("h"), 8).as("est"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }
}
