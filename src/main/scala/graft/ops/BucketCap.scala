package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guard for LSH-style per-bucket pair joins (q34/q37/q39). Bucket sizes
  * are bounded by the hash on a healthy corpus, but a DEGENERATE corpus
  * (e.g. millions of identical documents) collapses a whole table into one
  * bucket and the per-bucket self-join goes quadratic on a single reducer.
  *
  * The mitigation caps ONE side of the pair join at `maxPerBucket` members
  * per bucket (the lowest-id members — deterministic), leaving the other
  * side full. An oversized bucket of n members then produces O(n·cap)
  * pairs instead of O(n²), and every dropped member still pairs with each
  * kept low-id member — in particular with the bucket representative
  * (min id) — so duplicate-cluster connectivity survives the cap exactly
  * (union-find over the pairs yields the same components).
  *
  * The cap (64) sits ~8× above the largest bucket observed on the test
  * corpus (band buckets ≤8, sign buckets ≤16 at sf0.1), so it never fires
  * on healthy data and the oracle SQL needs no counterpart. BAND buckets
  * keep that property at 100 TB unaided (size tracks near-dup cluster
  * size, not corpus size); sign buckets scale their COUNT with the corpus
  * (VectorOps.adaptivePlanes) so the cap stays a degenerate-corpus
  * backstop at every scale, never a silent result-shaper on healthy data.
  *
  * Diagnostics are mode-driven via `spark.graft.bucketCap.mode`:
  *   - `silent` (default): cap only — no extra action, so bench/query runs
  *     never pay a diagnostic scan;
  *   - `log`: count dropped members (one small map-side-combined
  *     aggregate) and report to stderr when > 0;
  *   - `fail`: same count, but THROW when the cap fired — Verify runs in
  *     this mode, so the oracle correctness gate ASSERTS the cap never
  *     shaped an oracle-checked result.
  */
object BucketCap {

  /** Default cap: ≥8× the max healthy-corpus bucket observed at sf0.1. */
  val MaxPerBucket = 64

  /** silent | log | fail — see object doc. */
  val ModeConf = "spark.graft.bucketCap.mode"

  /** The `maxPerBucket` lowest-`id` members of every `bucket`.
    *
    * `mirrored = true` declares that the ORACLE replays this cap verbatim
    * (a row_number-per-bucket QUALIFY) — the cap is then part of the
    * operator's declared semantics, not a backstop, so the mode-driven
    * diagnostics (including Verify's fail mode) don't apply. No current
    * query needs it: q68's round-6 widening (60-bit signature, 4x15-bit
    * bands) made its band-key space scale with the corpus, so every LSH
    * operator now runs the cap as a pure degenerate-corpus backstop.
    */
  def capSide(
      df: DataFrame,
      bucket: Column,
      id: Column,
      maxPerBucket: Int = MaxPerBucket,
      tag: String = "bucket-cap",
      mirrored: Boolean = false
  ): DataFrame = {
    val mode = if (mirrored) "silent" else df.sparkSession.conf.get(ModeConf, "silent")
    if (mode != "silent") {
      val over = df
        .groupBy(bucket)
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") > maxPerBucket)
        .agg(coalesce(sum(col("_n") - maxPerBucket), lit(0L)), count(lit(1)))
        .collect()(0)
      if (over.getLong(0) > 0L) {
        val msg =
          s"[graft] $tag: ${over.getLong(1)} oversized bucket(s); dropped " +
            s"${over.getLong(0)} member(s) from the capped join side (cap=$maxPerBucket)"
        if (mode == "fail")
          throw new IllegalStateException(
            s"$msg — the cap must never fire on an oracle-checked corpus; " +
              "scale the bucket count (adaptivePlanes) instead"
          )
        System.err.println(msg)
      }
    }
    df.withColumn("_bc_rk", row_number().over(Window.partitionBy(bucket).orderBy(id)))
      .filter(col("_bc_rk") <= maxPerBucket)
      .drop("_bc_rk")
  }
}
