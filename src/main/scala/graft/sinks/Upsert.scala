package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Bulk JDBC upsert (reference K1/K2, `insert.py:115-234`): chunked
  * multi-row INSERT with update-on-PK-conflict, executed per partition on
  * the executors — the Spark replacement for the reference's driver-side
  * chunked statements. Chunk size defaults to the reference's 100 rows per
  * statement (`insert.py:149-150`, the SQLite variable-limit workaround).
  *
  * Dialects:
  *  - sqlite/postgres: `INSERT ... ON CONFLICT (pk) DO UPDATE SET ...`
  *  - derby: per-row `MERGE INTO ... USING SYSIBM.SYSDUMMY1` (Derby has no
  *    multi-row ON CONFLICT; used for in-repo integration tests since the
  *    container ships the Derby driver)
  *
  * Scale: each executor writes its partitions concurrently with batched
  * statements; for a real warehouse sink the same frame goes to parquet.
  * No driver materialization.
  *
  * Precondition: callers dedup by PK first (A11, `ops/Dedup` — the
  * reference does the same before insert, `insert.py:204-209`); duplicate
  * keys across partitions would otherwise race their upserts in an
  * undefined order.
  */
object Upsert {

  def writeJdbc(df: DataFrame, url: String, table: String, pks: Seq[String],
                dialect: DdlGen.Dialect, chunkSize: Int = 100): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          rows.grouped(chunkSize).foreach { chunk =>
            writeChunk(conn, table, schema, cols, pks, chunk, dialect)
            conn.commit()
          }
        } finally conn.close()
      }
    }
  }

  private def writeChunk(conn: Connection, table: String, schema: StructType,
                         cols: Seq[String], pks: Seq[String], chunk: Seq[Row],
                         dialect: DdlGen.Dialect): Unit = dialect match {
    case DdlGen.Derby =>
      // Derby MERGE only accepts base-table sources, so use the portable
      // update-then-insert pattern — also the reference's per-row fallback
      // for other dialects (K2, `insert.py:176-234`)
      val nonPk = cols.filterNot(pks.contains)
      def q(id: String) = DdlGen.quote(id, DdlGen.Derby)
      val updateSql = s"UPDATE ${q(table)} SET ${nonPk.map(c => s"${q(c)} = ?").mkString(", ")} " +
        s"WHERE ${pks.map(k => s"${q(k)} = ?").mkString(" AND ")}"
      val insertSql = s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
      val upd = conn.prepareStatement(updateSql)
      val ins = conn.prepareStatement(insertSql)
      val fieldIdx = schema.fieldNames.zipWithIndex.toMap
      try chunk.foreach { row =>
        (nonPk ++ pks).zipWithIndex.foreach { case (c, i) =>
          bindValue(upd, schema(c).dataType, row, fieldIdx(c), i + 1)
        }
        if (upd.executeUpdate() == 0) {
          cols.zipWithIndex.foreach { case (c, i) =>
            bindValue(ins, schema(c).dataType, row, fieldIdx(c), i + 1)
          }
          ins.executeUpdate()
        }
      } finally { upd.close(); ins.close() }
    case _ =>
      // sqlite / postgres: one multi-VALUES statement per chunk
      val nonPk = cols.filterNot(pks.contains)
      val valuesTpl = "(" + cols.map(_ => "?").mkString(", ") + ")"
      val values = Seq.fill(chunk.size)(valuesTpl).mkString(", ")
      val updates = nonPk.map(c => s"$c = excluded.$c").mkString(", ")
      val sql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES $values " +
        s"ON CONFLICT (${pks.mkString(", ")}) DO UPDATE SET $updates"
      val ps = conn.prepareStatement(sql)
      try {
        chunk.zipWithIndex.foreach { case (row, i) => bindRow(ps, schema, row, i * cols.size) }
        ps.executeUpdate()
      } finally ps.close()
  }

  private def bindRow(ps: PreparedStatement, schema: StructType, row: Row, offset: Int): Unit =
    schema.fields.zipWithIndex.foreach { case (field, i) =>
      bindValue(ps, field.dataType, row, i, offset + i + 1)
    }

  private def bindValue(ps: PreparedStatement, dt: DataType, row: Row,
                        rowIdx: Int, paramIdx: Int): Unit =
    if (row.isNullAt(rowIdx)) ps.setObject(paramIdx, null)
    else dt match {
      case StringType => ps.setString(paramIdx, row.getString(rowIdx))
      case IntegerType => ps.setInt(paramIdx, row.getInt(rowIdx))
      case LongType => ps.setLong(paramIdx, row.getLong(rowIdx))
      case DoubleType => ps.setDouble(paramIdx, row.getDouble(rowIdx))
      case BooleanType => ps.setBoolean(paramIdx, row.getBoolean(rowIdx))
      case TimestampType => ps.setTimestamp(paramIdx, row.getAs[Timestamp](rowIdx))
      case _ => ps.setString(paramIdx, String.valueOf(row.get(rowIdx))) // JSON-text nested
    }
}
