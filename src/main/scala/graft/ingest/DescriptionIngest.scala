package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4: server-description data-dump ingest (reference
  * `description_ingestor.py:21-91`): a directory tree holds one generated
  * `output.json` per server at `<data>/<vendor_id>/<api_reference>/
  * descriptions/output.json`; files that are missing, unparsable, or fail
  * field validation are skipped silently (the reference logs at debug and
  * returns None per server).
  *
  * Spark-first shape: ONE `spark.read.json` over the glob — the executors
  * list and parse files in parallel (vs the reference's per-server
  * sequential open/parse loop); the path-derived keys come back via
  * `input_file_name()`, and server-id recovery is a broadcast-sized join
  * against the server inventory on `(vendor_id, api_reference)`. At scale
  * the file listing is driver-side but the IO + parse + validate is fully
  * distributed; an explicit schema avoids a second inference pass over
  * every file.
  */
object DescriptionIngest {

  /** `ServerDescriptionFields` (table_bases.py:1133-1169): all seven
    * fields are required; arrays stay arrays (JSON columns in the
    * reference). */
  val outputSchema: StructType = StructType(Seq(
    StructField("page", ArrayType(StringType)),
    StructField("description", StringType),
    StructField("og_description", StringType),
    StructField("meta_description", StringType),
    StructField("tagline", StringType),
    StructField("bullet_points", ArrayType(StringType)),
    StructField("categories", ArrayType(StringType))))

  private val PathRe = "/([^/]+)/([^/]+)/descriptions/output\\.json$"

  /** Raw per-file frame keyed by path-derived `(vendor_id,
    * api_reference)`; invalid rows (unparsable JSON or any missing
    * required field) are dropped, mirroring the reference's skip-on-error
    * per server. */
  def readOutputs(spark: SparkSession, dataPath: String): DataFrame = {
    val withCorrupt = outputSchema.add("_corrupt_record", StringType)
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      // real dumps are pretty-printed whole-file JSON documents, not JSONL
      .option("multiLine", "true")
      .json(s"$dataPath/*/*/descriptions/output.json")
      // input_file_name() URL-encodes; decode so api_reference values with
      // spaces ("Standard D2 v5") match the inventory join key
      .withColumn("__path", url_decode(input_file_name()))
    val validated = raw
      .withColumn("vendor_id", regexp_extract(col("__path"), PathRe, 1))
      .withColumn("api_reference", regexp_extract(col("__path"), PathRe, 2))
      .filter(col("_corrupt_record").isNull)
      .filter(outputSchema.fieldNames.map(col(_).isNotNull).reduce(_ && _))
      .filter(size(col("page")) > 0 && size(col("bullet_points")) > 0 &&
        size(col("categories")) > 0)
    validated.select(col("vendor_id") +: col("api_reference") +:
      outputSchema.fieldNames.toIndexedSeq.map(col(_)): _*)
  }

  /** Full ingest: join the validated outputs to the server inventory
    * (`vendor_id`, `server_id`, `api_reference`) to recover server ids —
    * the reference iterates servers and derives the path per server;
    * joining the other way keeps unknown directories out (same result set)
    * and stays distributed. The inventory side is dimension-sized →
    * broadcast. */
  def ingest(spark: SparkSession, dataPath: String, servers: DataFrame): DataFrame = {
    val outputs = readOutputs(spark, dataPath)
    outputs.join(
        broadcast(servers.select(col("vendor_id"), col("server_id"), col("api_reference"))),
        Seq("vendor_id", "api_reference"))
      .select(col("vendor_id") +: col("server_id") +:
        outputSchema.fieldNames.toIndexedSeq.map(col(_)): _*)
  }
}
