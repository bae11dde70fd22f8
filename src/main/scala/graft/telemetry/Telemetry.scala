package graft.telemetry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Telemetry surface — the reference's decoupled print-events +
  * committed-rows counters (`EventManager.cs:5-14`,
  * `ExporterDatabaseManager.cs:83-87,183-185`) re-expressed as Spark
  * observability primitives: a `QueryExecutionListener` (per-action
  * completion events, the analog of OnCommitted) and a `LongAccumulator`
  * (distributed row counter, the analog of the committed-rows tally).
  */
object Telemetry {

  /** Run an instrumented pass over `events`: count rows through an
    * accumulator on the executors while a listener observes the action.
    * Returns one summary row (action name, accumulator total, listener
    * observation count ≥ 1).
    */
  def instrumentedScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val captured = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.incrementAndGet()
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        captured.incrementAndGet()
    }
    spark.listenerManager.register(listener)
    val acc = spark.sparkContext.longAccumulator("graft_rows_seen")
    try {
      val events = graft.ops.Tables.events(spark, dir)
      events.toDF().rdd.foreach(_ => acc.add(1))
      // listener events post asynchronously; bounded wait
      val deadline = System.nanoTime() + 5_000_000_000L
      while (captured.get() == 0 && System.nanoTime() < deadline) Thread.sleep(20)
    } finally spark.listenerManager.unregister(listener)
    Seq(("events_scan", acc.value.toLong, captured.get() > 0))
      .toDF("action", "rows_counted", "listener_fired")
  }

  /** s29: the `Observation` API — Spark's SQL-native in-flight metrics
    * channel (`df.observe` → `CollectMetricsExec`), the third telemetry
    * primitive beside s06's accumulator and listener. The gate metrics
    * (row count, char volume, max doc length, null-lang violations) are
    * collected ON THE SAME PASS as the driving action — at 100 TB this is
    * how a pipeline audits every export without paying a second scan; the
    * accumulator path (s06) counts too, but observe() rides the SQL plan
    * (codegen, partial aggregation) instead of per-row lambda calls, and
    * its metrics are declared expressions, not imperative side effects.
    * The driving action is a `noop`-format write — full scan, nothing
    * materialized. The emitted row IS `Observation.get`, so the DuckDB
    * hash-compare proves the in-flight metrics equal a from-scratch
    * recomputation.
    */
  def observedGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, dir)
    // fresh Observation per invocation: an instance is single-attach
    val obs = org.apache.spark.sql.Observation()
    val observed = docs.observe(
      obs,
      count(lit(1)).as("n_rows"),
      sum(col("n_chars")).as("sum_chars"),
      max(length(col("text"))).cast("long").as("max_len"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang")
    )
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    Seq((
      m("n_rows").asInstanceOf[Long],
      m("sum_chars").asInstanceOf[Long],
      m("max_len").asInstanceOf[Long],
      m("n_null_lang").asInstanceOf[Long]
    )).toDF("n_rows", "sum_chars", "max_len", "n_null_lang")
  }
}
