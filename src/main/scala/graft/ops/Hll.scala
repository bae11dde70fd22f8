package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-integer HyperLogLog kernel shared by q170 (batch registers +
  * merge audit) and s36 (streaming register maintenance): m=64 registers
  * over the shared h60 — bucket = top 6 bits, rank = leading zeros of
  * the 54-bit remainder + 1 via the minimal-binary-length identity
  * (Spark `conv(x,10,2)` ≡ DuckDB `bin(x)`), harmonic sum scaled to
  * integers (S = Σ 2^(55−M_b), absent registers contribute 2^55), and
  * the Flajolet estimate α₆₄·m²·2^55/S in DECIMAL(38,0)/HUGEINT with
  * one truncating division — no libm, bit-exact at any corpus size.
  * α₆₄ = 0.709 (the paper's constant for m=64) as the rational
  * 709/1000.
  */
object Hll {

  val M = 64
  val Two54: Long = 1L << 54
  val Two55: Long = 1L << 55

  /** Bucket of a 60-bit hash column named `h`: its top 6 bits. */
  def bucketCol: Column = expr(s"h div $Two54")

  /** Rank of a 60-bit hash column named `h`: leading zeros of the
    * 54-bit remainder + 1, via the minimal-binary-length identity.
    */
  def rankCol: Column =
    expr(s"""CASE WHEN h % $Two54 = 0 THEN CAST(55 AS BIGINT)
      ELSE CAST(55 - length(conv(h % $Two54, 10, 2)) AS BIGINT) END""")

  /** Register set: per-bucket max rank (≤ M rows). */
  def registers(bucketRanks: DataFrame): DataFrame =
    bucketRanks.groupBy("bucket").agg(max("rk").as("mr"))

  /** 1-row (s_h, n_regs) integer harmonic frame over a register set. */
  def harmonic(regs: DataFrame): DataFrame =
    regs.agg(
      (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mr AS INT))")) +
        (lit(M.toLong) - count(lit(1))) * lit(Two55)).as("s_h"),
      count(lit(1)).as("n_regs"))

  /** Estimate from an `s_h` column — exact integer, both engines. */
  def estimate: Column =
    expr(s"CAST((CAST(709 AS DECIMAL(38,0)) * 4096 * $Two55) " +
      "div (CAST(s_h AS DECIMAL(38,0)) * 1000) AS BIGINT)")

  /** Collected (bucket, max-rank) register census of a key column —
    * ≤ M rows of planner metadata (the bounded-collect class q210/s64
    * declare). Sorted by bucket so censuses compare structurally.
    */
  def registerCensus(df: DataFrame, key: Column): Seq[(Long, Long)] =
    df.select(Hashing.h60(key).as("h"))
      .select(bucketCol.as("bucket"), rankCol.as("rk"))
      .groupBy("bucket").agg(max("rk").as("mr"))
      .collect() // ≤64 register cells — sketch metadata, not data
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  /** Union-merge of two collected register sets: per-bucket max — the
    * HLL merge property across RELATIONS (q217's union/overlap sizing).
    */
  def mergeRegisters(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }
      .toSeq.sortBy(_._1)

  /** Driver-side Flajolet estimate over a collected register set —
    * BigInt mirror of [[estimate]] (the single source the q210/s64
    * call sites and the oracle constants are kept in sync against).
    */
  def estimateInt(regs: Seq[(Long, Long)]): Long = {
    val sH = regs.map { case (_, mr) => BigInt(1) << (55 - mr.toInt) }.sum +
      BigInt(M - regs.size) * (BigInt(1) << 55)
    (BigInt(709) * 4096 * (BigInt(1) << 55) / (sH * 1000)).toLong
  }
}
