package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** JSON export (reference K4 `dump`, `cli.py:600-757`): rows as JSON
  * partitioned by primary key prefix, plus a `_schema.json` per table.
  * The reference writes one file per row keyed `table/pk1/pk2.json`; at
  * scale one-file-per-row is an anti-pattern, so this writes standard
  * partitioned JSON (`partitionBy(pk-prefix)`) with the full PK embedded in
  * each record — same information, cluster-writable layout. */
object JsonDump {

  def dump(df: DataFrame, outDir: String, table: String,
           partitionKeys: Seq[String]): Unit = {
    val dir = s"$outDir/$table"
    // partition columns vanish from file contents; duplicate them so each
    // record stays self-contained like the reference's per-row files
    val withDup = partitionKeys.foldLeft(df) { (d, k) =>
      d.withColumn(s"__pk_$k", col(k))
    }
    withDup.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionKeys.map(k => s"__pk_$k"): _*)
      .json(dir)
    Files.writeString(Paths.get(s"$dir/_schema.json"), df.schema.prettyJson)
  }
}
