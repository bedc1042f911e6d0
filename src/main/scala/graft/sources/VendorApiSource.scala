package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSourceV2 source modeling a paginated vendor pricing API
  * (reference S1/S2: per-region SDK fetches on a thread pool,
  * `vendor_helpers.py:30-62`): ONE InputPartition per region, so a
  * 1000-executor cluster fetches 1000 regions concurrently with no driver
  * fan-out code, and `SupportsPushDownFilters` prunes regions at PLANNING
  * time (the reference's API-side TERM_MATCH/$filter pushdown, F3).
  *
  * The in-container "API" is a deterministic generator (zero egress); a
  * production build swaps `RegionReader.fetchPage` for the real SDK call —
  * the partitioning, pushdown, and planning machinery is the point.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.VendorApiSource")
  *     .option("regions", "us-east-1,eu-west-1")
  *     .option("rowsPerRegion", "100")
  *     .load()
  * }}}
  */
class VendorApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VendorApiSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VendorApiTable(properties.asScala.toMap)
}

object VendorApiSource {
  val schema: StructType = new StructType()
    .add("region", StringType, nullable = false)
    .add("instance_type", StringType, nullable = false)
    .add("price", DoubleType, nullable = false)

  val families = Seq("m5.large", "c5.xlarge", "r6g.large", "t3.micro")

  /** Deterministic fake of one region's paginated API response. */
  def fetchRegion(region: String, rows: Int): Iterator[(String, String, Double)] =
    (0 until rows).iterator.map { i =>
      val it = families(i % families.length)
      val price = ((math.abs((region + it).hashCode) % 10000) + i % 97) / 10000.0
      (region, it, math.rint(price * 10000) / 10000)
    }
}

class VendorApiTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_vendor_api"
  override def schema(): StructType = VendorApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VendorScanBuilder(
      options.getOrDefault("regions", props.getOrElse("regions", "us-east-1")),
      options.getOrDefault("rowsPerRegion", props.getOrElse("rowsPerRegion", "100")).toInt)
}

class VendorScanBuilder(regionsCsv: String, rowsPerRegion: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownRequiredColumns {

  private var regions: Seq[String] = regionsCsv.split(",").map(_.trim).toSeq
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var required: StructType = VendorApiSource.schema

  /** LIMIT pushdown (API page-size clamp): each region fetches at most
    * `limit` rows instead of its full page set. PARTIALLY pushed — with
    * several regions the union can still exceed the limit, so Spark
    * keeps its global limit; the win is per-partition fetch volume. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = true

  /** Column pruning (API field selection): the reader materializes only
    * the requested fields — a real SDK would put them in the request's
    * field mask. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("region", _: String) => true
      case In("region", _) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("region", v: String) => regions = regions.filter(_ == v)
      case In("region", vs) => regions = regions.filter(r => vs.contains(r))
      case _ => ()
    }
    pushed = accepted
    rejected // Spark evaluates only these after the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new VendorScan(regions, limit.fold(rowsPerRegion)(math.min(_, rowsPerRegion)),
      required)
}

class VendorScan(regions: Seq[String], rowsPerRegion: Int,
                 required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-vendor-api [regions=${regions.mkString(",")} rows=$rowsPerRegion " +
      s"cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    regions.map(r => RegionPartition(r, rowsPerRegion): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    RegionReaderFactory(required)
}

/** Top-level (serializable) factory — must not capture the Scan. */
case class RegionReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RegionPartition]
    new RegionReader(rp.region, rp.rows, required)
  }
}

case class RegionPartition(region: String, rows: Int) extends InputPartition

class RegionReader(region: String, rows: Int,
                   required: StructType) extends PartitionReader[InternalRow] {
  private val it = VendorApiSource.fetchRegion(region, rows)
  private var current: (String, String, Double) = _
  // resolve the projection once per reader, not per row
  private val proj: Array[((String, String, Double)) => Any] =
    required.fieldNames.map {
      case "region" => (t: (String, String, Double)) => UTF8String.fromString(t._1)
      case "instance_type" => (t: (String, String, Double)) => UTF8String.fromString(t._2)
      case "price" => (t: (String, String, Double)) => t._3
    }
  override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
  override def get(): InternalRow = InternalRow(proj.map(_(current)): _*)
  override def close(): Unit = ()
}
