package graft

import graft.queries.Registry
import graft.sinks.DuckDbLive
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-dtype parity guard — the q141 class can't ship again.
  *
  * Round-10 shipped a one-line oracle bug the whole gate missed: DuckDB's
  * windowed `sum(BIGINT)` returns HUGEINT, an uncast `//` propagated it,
  * and the driver's pandas materialization floated it (`6833.0` vs Spark's
  * int64 `6833`) — `rows_match`/`schema_match` both passed (the driver's
  * schema check compares NAMES, not engine-side dtypes) and only the value
  * hash caught it, one full round later. This spec closes the class at
  * test time: for EVERY `SparkEntry.oracleSql`, `DESCRIBE <sql>` runs
  * through the in-classpath DuckDB JDBC driver (the s01 machinery) over
  * views of the sf0.001 parquet — DESCRIBE plans without executing, so the
  * whole sweep is cheap — and each surfaced column's DuckDB type must map
  * to the Spark result schema's type under the driver's VALUE-HASH
  * equivalence (what pandas `repr` distinguishes):
  *
  *   - integer widths are one class (TINYINT..BIGINT ↔ Byte..LongType:
  *     int64 repr either way), but HUGEINT is NOT in it — pandas
  *     materializes HUGEINT as float64, the exact r10 failure;
  *   - DOUBLE ↔ DoubleType strictly (FLOAT/REAL would repr float32);
  *   - DECIMAL matches on SCALE (repr carries scale, not precision);
  *   - TIMESTAMP flavors ↔ Timestamp/TimestampNTZ (UTC session);
  *   - lists recurse element-wise.
  *
  * SURVEY.md §2.3 determinism conventions carry the matching authoring
  * rule: surfaced oracle integer columns are explicitly CAST.
  */
class OracleDtypeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** DuckDB rendered type ↔ Spark type, under value-hash equivalence. */
  private def compatible(duck: String, sp: DataType): Boolean = {
    val d = duck.trim.toUpperCase
    (d, sp) match {
      case (t, ArrayType(el, _)) if t.endsWith("[]") =>
        compatible(t.dropRight(2), el)
      case (t, _) if t.endsWith("[]") => false
      case ("TINYINT" | "SMALLINT" | "INTEGER" | "BIGINT",
            ByteType | ShortType | IntegerType | LongType) => true
      case ("DOUBLE", DoubleType)                => true
      case ("FLOAT" | "REAL", FloatType)         => true
      case ("VARCHAR", StringType)               => true
      case ("BOOLEAN", BooleanType)              => true
      case ("DATE", DateType)                    => true
      case ("BLOB", BinaryType)                  => true
      case (t, TimestampType) if t.startsWith("TIMESTAMP")    => true
      case (t, TimestampNTZType) if t.startsWith("TIMESTAMP") => true
      case (t, dec: DecimalType) if t.startsWith("DECIMAL") =>
        val scale = "\\d+".r.findAllIn(t).toSeq.lastOption.map(_.toInt)
        scale.contains(dec.scale)
      case _ => false // HUGEINT, UBIGINT, unmapped — always a finding
    }
  }

  test("every oracle's DESCRIBE dtypes match the Spark result schema") {
    assume(DuckDbLive.available, "duckdb_jdbc jar not in the offline cache")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val findings = DuckDbLive.withConnection("") { c =>
      tables.foreach { t =>
        DuckDbLive.execute(
          c,
          s"CREATE VIEW $t AS SELECT * FROM read_parquet('$sfDir/$t.parquet')")
      }
      Registry.all.flatMap { q =>
        q.oracle.toSeq.flatMap { sql =>
          val duckCols = DuckDbLive
            .queryRows(c, s"DESCRIBE $sql")
            .map(r => r(0).toString -> r(1).toString)
          // the Spark schema: plan-only for most queries (streaming demos
          // settle during construction — sf0.001 keeps that bounded)
          val sparkSchema = q.run(spark, sfDir).schema
          val sparkByName = sparkSchema.fields.map(f => f.name -> f.dataType).toMap
          val nameFindings =
            if (duckCols.map(_._1).sorted == sparkSchema.fieldNames.sorted.toSeq) Nil
            else Seq(s"${q.name}: column names differ — oracle=${duckCols.map(_._1).sorted
                .mkString(",")} spark=${sparkSchema.fieldNames.sorted.mkString(",")}")
          val typeFindings = duckCols.flatMap { case (name, dtype) =>
            sparkByName.get(name).collect {
              case sp if !compatible(dtype, sp) =>
                s"${q.name}.$name: oracle $dtype vs spark $sp"
            }
          }
          nameFindings ++ typeFindings
        }
      }
    }
    assert(findings.isEmpty, findings.mkString("\n  ", "\n  ", ""))
  }
}
