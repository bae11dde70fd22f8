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
}
