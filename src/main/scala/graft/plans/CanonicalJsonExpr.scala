package graft.plans

import graft.ops.CanonicalJson
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Python-`json.dumps`-compatible canonical
  * JSON over a struct (A10; SURVEY §7.3 names this the one operator worth
  * a custom expression). Compared to the Scala UDF it avoids the
  * InternalRow → GenericRow conversion and Encoder round-trip: it walks
  * Catalyst's internal representation directly (`UTF8String`, `ArrayData`,
  * `MapData`, micros-long timestamps). `CodegenFallback` keeps it usable
  * inside whole-stage codegen'd stages (the fallback call is a single
  * virtual call per row; the serialization itself dominates).
  */
case class CanonicalJsonExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_json"

  override protected def withNewChildInternal(newChild: Expression): CanonicalJsonExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(CanonicalJson.serialize(toScala(input, child.dataType)))

  /** Catalyst internal value → plain Scala tree the serializer understands. */
  private def toScala(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: UTF8String, StringType) => s.toString
    case (row: InternalRow, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, i) =>
        f.name -> toScala(row.get(i, f.dataType), f.dataType)
      }.toMap
    case (arr: ArrayData, ArrayType(et, _)) =>
      arr.toObjectArray(et).map(toScala(_, et)).toSeq
    case (m: MapData, MapType(kt, vt, _)) =>
      val ks = m.keyArray().toObjectArray(kt).map(toScala(_, kt))
      val vs = m.valueArray().toObjectArray(vt).map(toScala(_, vt))
      ks.zip(vs).toMap
    case (micros: Long, TimestampType) =>
      java.time.Instant.EPOCH.plusNanos(micros * 1000L).toString
    case (d: org.apache.spark.sql.types.Decimal, _) => d.toBigDecimal
    case (other, _) => other
  }
}
