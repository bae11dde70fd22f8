package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means for the IVF codebook (q41) — replaces the
  * round-3 placeholder codebook (the first 8 raw vectors) with trained
  * centroids, while staying bit-reproducible across engines so the DuckDB
  * oracle can replay the identical recurrence:
  *
  *   - init: the K lowest-vec_id vectors, widened float→double (exact);
  *   - assign: argmax of r6(dot(x, cent)), ties to the lowest cent_id —
  *     dot is the order-deterministic fold (graft_dotf), r6 the shared
  *     6-decimal floor-round, so assignments match the oracle bit-for-bit;
  *   - update: per-cell element-wise mean over vectors QUANTIZED to
  *     integers (floor(x·1e6 + 0.5) as BIGINT). Integer sums are exact and
  *     order-free — the one place a naive double sum would diverge between
  *     engines (and across Spark partial-aggregation orders) — and the
  *     final division (sum / (n·1e6)) is a single deterministic IEEE op.
  *
  * Scale path: assignment is a broadcast of K centroids + a map-side
  * argmax; the update is one partial-aggregated shuffle of (cell, dim)
  * keys per iteration (K·dim groups, tiny). At 100 TB you train on a
  * sample with the same recurrence; the codebook itself is metadata
  * (K·dim doubles) and is collected to the driver exactly like any
  * production IVF index build.
  */
object IvfKMeans {

  val K = 8
  val Iters = 2

  /** floor(x·1e6 + 0.5) per element, as exact BIGINTs. Oracle mirror:
    * `list_transform(e, x -> CAST(floor(CAST(x AS DOUBLE)*1e6 + 5e-1) AS BIGINT))`.
    */
  private def quant(e: Column): Column =
    transform(e, x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))

  /** Assign every vector to its nearest (argmax rounded-dot) centroid.
    * `cents`: (cent_id, cent array<double>). Output: (vec_id, embedding,
    * cell).
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("embedding"),
        col("cent_id"),
        FeatureOps.r6(VectorOps.dot(col("embedding"), col("cent"))).as("cdot")
      )
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cent_id")))
      )
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))

  /** Recompute centroids as the per-cell element-wise quantized mean.
    * Exact integer sums per (cell, dim) → order-independent; array
    * rebuilt in dim order via array_sort on (dim, value) structs.
    */
  def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(quant(col("embedding"))).as(Seq("i", "qx")))
      .groupBy(col("cell"), col("i"))
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      .groupBy(col("cell"))
      .agg(
        array_sort(
          collect_list(
            struct(col("i"), (col("sq").cast("double") / (col("n").cast("double") * lit(1e6))).as("v"))
          )
        ).as("pv")
      )
      .select(col("cell").as("cent_id"), transform(col("pv"), p => p("v")).as("cent"))

  /** Train the codebook over `e` (vec_id, embedding): init from the K
    * lowest vec_ids, `Iters` Lloyd steps over the remaining vectors, then
    * collect the K·dim doubles to the driver (codebook = index metadata,
    * not data — the standard IVF build) and return them as a literal
    * DataFrame so downstream plans broadcast a leaf, not the training
    * lineage.
    */
  def codebook(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    val vecs = e.filter(col("vec_id") >= K).select("vec_id", "embedding")
    var cents = e
      .filter(col("vec_id") < K)
      .select(col("vec_id").as("cent_id"), transform(col("embedding"), _.cast("double")).as("cent"))
    for (_ <- 1 to Iters) cents = update(assign(vecs, cents))
    cents
      .as[(Long, Seq[Double])]
      .collect()
      .sortBy(_._1)
      .toSeq
      .toDF("cent_id", "cent")
  }
}
