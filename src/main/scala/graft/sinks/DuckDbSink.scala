package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Dynamic-schema DuckDB-compatible sink — the Spark-native re-expression
  * of the reference's reflection-derived exporter (`DatabaseWriter.cs:
  * 131-256`): columns are the row schema's fields **ordinal-sorted by
  * name** (`DatabaseWriter.cs:222-225`), identifiers quoted with doubled
  * `"` (`DatabaseWriter.cs:467`), doubles optionally stored as float32
  * (`DatabaseWriter.cs:198-202`, `UseFloat32` default true), and DDL
  * generated as `CREATE TABLE IF NOT EXISTS` (`DatabaseWriter.cs:252`).
  *
  * The canonical at-rest format is Parquet plus generated DuckDB DDL/CTAS
  * text that DuckDB executes directly over the parquet output — open
  * format, distributed write, the handoff that scales. Spark's file-sink
  * commit protocol replaces the reference's commit/CHECKPOINT cadence
  * (O22) in batch mode. Since round 8 the LIVE appender path also exists
  * (`DuckDbLive`, the public duckdb_jdbc driver discovered in the offline
  * artifact cache) for bounded driver-side exports; this object stays the
  * schema/DDL authority for both paths.
  */
object DuckDbSink {

  /** `"` doubled inside quoted identifiers — `DatabaseWriter.cs:467`. */
  def quoteIdent(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  /** Spark → DuckDB type map, mirroring the reference's .NET → DuckDB map
    * (`DatabaseWriter.cs:299-315`; SURVEY.md §1.4).
    */
  def duckType(dt: DataType, useFloat32: Boolean): String = dt match {
    case StringType => "VARCHAR"
    case BinaryType => "BLOB"
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => if (useFloat32) "REAL" else "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case _: DayTimeIntervalType => "INTERVAL"
    case ArrayType(e, _) => duckType(e, useFloat32) + "[]"
    case _ => "VARCHAR"
  }

  /** Ordinal (code-point) column sort — `DatabaseWriter.cs:222-225` uses
    * `StringComparer.Ordinal`; Scala's default String ordering is the same
    * code-point comparison.
    */
  def ordinalColumns(schema: StructType): Seq[StructField] =
    schema.fields.sortBy(_.name).toIndexedSeq

  /** `CREATE TABLE IF NOT EXISTS` DDL for a DataFrame schema. */
  def ddlFor(schema: StructType, table: String, useFloat32: Boolean = true): String = {
    val cols = ordinalColumns(schema)
      .map(f => s"${quoteIdent(f.name)} ${duckType(f.dataType, useFloat32)}")
      .mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${quoteIdent(table)} ($cols)"
  }

  /** DuckDB statement that loads the parquet export into the table —
    * the read-side handshake replacing the appender (`DatabaseWriter.cs:
    * 141-212`).
    */
  def insertFor(table: String, parquetPath: String): String =
    s"INSERT INTO ${quoteIdent(table)} SELECT * FROM read_parquet('$parquetPath/*.parquet')"

  /** Normalize + write: ordinal column order, optional double→float32
    * downcast, parquet at `path`. Returns (ddl, insert) DuckDB statements.
    */
  def write(df: DataFrame, table: String, path: String, useFloat32: Boolean = true): (String, String) = {
    val cols = ordinalColumns(df.schema).map { f =>
      if (useFloat32 && f.dataType == DoubleType) col(f.name).cast("float").as(f.name)
      else col(f.name)
    }
    val out = df.select(cols: _*)
    out.write.mode("overwrite").parquet(path)
    (ddlFor(out.schema, table, useFloat32 = false), insertFor(table, path))
  }
}
