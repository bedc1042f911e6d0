package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StrUtilsSpec extends SparkSpec {

  test("snake_case matches the reference's derivation, incl. table names") {
    assert(StrUtils.snakeCase("DescriptionToComment") == "description_to_comment")
    assert(StrUtils.snakeCase("ServerPrice") == "server_price")
    assert(StrUtils.snakeCase("VendorComplianceLink") == "vendor_compliance_link")
    assert(StrUtils.snakeCase("HTTPResponse") == "http_response")
    assert(StrUtils.tableName("Ipv4Price") == "ipv4_price")
  }

  test("plural preserves the reference's quirks verbatim") {
    assert(StrUtils.plural("dog") == "dogs")
    assert(StrUtils.plural("boy") == "boies") // reference docstring :facepalm:
    assert(StrUtils.plural("city") == "citys") // consonant+y falls through to +s
    assert(StrUtils.plural("box") == "boxes")
    assert(StrUtils.plural("church") == "churches")
    assert(StrUtils.plural("month") == "months") // t before h is excluded
    assert(StrUtils.plural("graph") == "graphs") // p is in the exclusion set
  }

  test("wrap/spaceAfter/extractLastNumber match the reference") {
    assert(StrUtils.wrap("") == "")
    assert(StrUtils.wrap("x") == " x ")
    assert(StrUtils.spaceAfter("pre") == "pre ")
    assert(StrUtils.extractLastNumber("foo42").contains(42.0))
    assert(StrUtils.extractLastNumber("foo24.42bar").contains(24.42))
    assert(StrUtils.extractLastNumber("none").isEmpty)
  }

  test("column variants agree with the Scala forms") {
    val sp = spark; import sp.implicits._
    val words = Seq("DescriptionToComment", "ServerPrice", "Ipv4Price").toDF("w")
    val snakes = words.select(StrUtils.snakeCaseCol(col("w")).as("s"))
      .as[String].collect().toSeq
    assert(snakes == Seq("DescriptionToComment", "ServerPrice", "Ipv4Price")
      .map(StrUtils.snakeCase))
    val ns = Seq("dog", "boy", "city", "box", "church", "month", "graph", "bush")
    val plurals = ns.toDF("n").select(StrUtils.pluralCol(col("n")).as("p"))
      .as[String].collect().toSeq
    assert(plurals == ns.map(StrUtils.plural))
    val nums = Seq("foo42", "foo24.42bar", "none").toDF("t")
      .select(StrUtils.extractLastNumberCol(col("t")).as("v"))
      .as[Option[Double]].collect().toSeq
    assert(nums == Seq(Some(42.0), Some(24.42), None))
  }
}
