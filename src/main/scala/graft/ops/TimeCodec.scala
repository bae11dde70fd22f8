package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer time codecs matching the reference's NinjaTrader built-ins
  * (`ToTime(DateTime) -> int HHmmss`, `ToDay(DateTime) -> int yyyyMMdd`,
  * used at `StrategyAnalyzerExporter.cs:191,207-208`).
  *
  * Emitted as LongType so every integer output column of the engine has one
  * type (BIGINT) on both the Spark and DuckDB oracle sides.
  */
object TimeCodec {

  /** yyyyMMdd code. Oracle mirror:
    * `CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS BIGINT)`.
    */
  def dayInt(ts: Column): Column =
    (year(ts) * 10000 + month(ts) * 100 + dayofmonth(ts)).cast("long")

  /** HHmmss code. Oracle mirror:
    * `CAST(hour(ts)*10000 + minute(ts)*100 + second(ts) AS BIGINT)`.
    */
  def timeInt(ts: Column): Column =
    (hour(ts) * 10000 + minute(ts) * 100 + second(ts)).cast("long")
}
