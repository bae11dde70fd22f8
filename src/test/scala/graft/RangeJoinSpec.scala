package graft

import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q50's bucketed range-join rewrite must stay RESULT-IDENTICAL to the
  * plain (unbucketed) range join. The rewrite's correctness argument —
  * "an order in 30-day bucket b can only satisfy the range for events in
  * buckets {b, b+1}" — depends on INTERVAL 30 DAYS being exactly
  * 30*86400 s and on unix_timestamp bucketing agreeing with the range
  * cast, both true only under the pinned UTC session timezone. This spec
  * makes that implication executable so a future edit to the bucket size
  * or interval can't silently drop edge rows.
  */
class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed q50 equals the plain unbucketed range join") {
    val bucketed = SparkEntry
      .queries("q50_range_join")(spark, dir)
      .collect()
      .map(_.toSeq)
      .toSeq

    val e = Tables.events(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderdate"))
    val plain = e
      .join(
        o,
        pmod(col("o_custkey"), lit(15)) === col("user_id") &&
          col("o_orderdate") >= col("ts") - expr("INTERVAL 30 DAYS") &&
          col("o_orderdate") <= col("ts"),
        "left_outer"
      )
      .groupBy(col("event_id"))
      .agg(count(col("o_custkey")).as("n_orders_30d"))
      .orderBy("event_id")
      .collect()
      .map(_.toSeq)
      .toSeq

    assert(bucketed == plain)
  }
}
