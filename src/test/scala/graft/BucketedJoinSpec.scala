package graft

import graft.ops.{BucketedJoin, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: zero exchanges on the join, and the result
  * matches the plain (shuffled) join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucket-aligned sort-merge join has no shuffle and matches the shuffled result") {
    val dir = "/root/testdata/sf0.001"
    val row = BucketedJoin.demo(spark, dir).collect().head
    assert(row.getAs[Boolean]("join_without_shuffle"), "join inputs must not shuffle")

    val plain = Tables
      .lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .agg(
        count(lit(1)),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double")
      )
      .collect()
      .head
    assert(row.getLong(0) == plain.getLong(0))
    assert(row.getDouble(1) == plain.getDouble(1))
  }
}
