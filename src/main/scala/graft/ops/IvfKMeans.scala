package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means for the IVF codebook (q41) — replaces the
  * round-3 placeholder codebook (the first 8 raw vectors) with trained
  * centroids, while staying bit-reproducible across engines so the DuckDB
  * oracle can replay the identical recurrence:
  *
  *   - init: the K lowest-vec_id vectors, widened float→double (exact);
  *   - assign: argmax of r6(dot(x, cent)), ties to the lowest cent_id —
  *     dot is the left-to-right fold (graft_dotf's order), r6 the shared
  *     6-decimal floor-round, so assignments match the oracle bit-for-bit;
  *   - update: per-cell element-wise mean over vectors QUANTIZED to
  *     integers (floor(x·1e6 + 0.5) as Long). Integer sums are exact and
  *     ORDER-FREE — the one place a naive double sum would diverge between
  *     engines (and across aggregation orders) — and the final division
  *     (sum / (n·1e6)) is a single deterministic IEEE op. Cells that lose
  *     all members drop out, exactly as in the oracle's GROUP BY.
  *
  * Training runs driver-side over the collected training set — the
  * standard IVF index build (train on a bounded sample, the codebook is
  * K·dim doubles of index METADATA, not data). At 100 TB pass a sampled
  * DataFrame; the recurrence is sample-order-independent either way.
  * Only `assign` — the per-row data path — is distributed: a broadcast of
  * K centroids plus a map-side argmax.
  */
object IvfKMeans {

  val K = 8
  val Iters = 2

  /** Driver-side training-set bound: the TrainLimit lowest vec_ids ≥ K —
    * a deterministic, pushdown-friendly range predicate, not a sample
    * that would need shared random state with the oracle. Caps the
    * codebook() collect at TrainLimit·dim floats regardless of corpus
    * size (round-4 ADVICE item 2: the previous unbounded collect pulled
    * the whole table to the driver). Covers every test corpus (≤2000
    * vectors) entirely, so results are unchanged where training data is
    * under the bound.
    */
  val TrainLimit = 2048L

  /** ↔ FeatureOps.r6 (floor(x·1e6 + 0.5)/1e6; the double-floor value is
    * bit-identical to Spark's long-floor for every magnitude we round).
    */
  private[graft] def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** ↔ graft_dotf: left-to-right fold with float→double widening. */
  private[graft] def dotD(a: Array[Float], c: Array[Double]): Double = {
    val n = math.min(a.length, c.length)
    var s = 0.0
    var i = 0
    while (i < n) { s = s + a(i).toDouble * c(i); i += 1 }
    s
  }

  /** Rank all K centroids per vector by rounded dot (descending, ties to
    * the lowest cent_id) and keep the nearest `p` — the shared kernel for
    * single-cell assignment (p=1) and multi-probe search (p>1). `cents`:
    * (cent_id, cent array<double>). Output: (vec_id, embedding, cell, rk).
    */
  def assignTopP(vecs: DataFrame, cents: DataFrame, p: Int): DataFrame =
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
      .filter(col("rk") <= p)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"), col("rk"))

  /** Assign every vector to its nearest (argmax rounded-dot) centroid —
    * the distributed data path. Output: (vec_id, embedding, cell).
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    assignTopP(vecs, cents, 1).drop("rk")

  /** Train the codebook over `e` (vec_id, embedding): init from the K
    * lowest vec_ids, `Iters` Lloyd steps over the next ≤TrainLimit
    * vectors (vec_id ∈ [K, K+TrainLimit) — the standard IVF build trains
    * on a bounded sample; the codebook is K·dim doubles of index
    * METADATA). Returns a literal (cent_id, cent) DataFrame so downstream
    * plans broadcast a leaf, not the training lineage.
    */
  def codebook(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    codebookSeq(spark, e).map { case (id, c) => (id, c.toSeq) }.toDF("cent_id", "cent")
  }

  /** The trained codebook as driver-side data — the shared kernel behind
    * `codebook` (which wraps it as a literal DataFrame) and the PQ
    * operator (q67), which trains one codebook per SUBSPACE and folds the
    * centroids into literal scoring expressions.
    */
  def codebookSeq(spark: SparkSession, e: DataFrame): Seq[(Long, Array[Double])] = {
    import spark.implicits._
    val seeds: Seq[(Long, Array[Double])] = e
      .filter(col("vec_id") < K)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toDouble)) }
      .toSeq
    val train: Array[Array[Float]] = e
      .filter(col("vec_id") >= K && col("vec_id") < K + TrainLimit)
      .select("embedding")
      .as[Array[Float]]
      .collect()

    var cents = seeds
    for (_ <- 1 to Iters) cents = lloydStep(train, cents, retain = false)
    cents
  }

  /** One deterministic Lloyd step: assign `train` to the argmax-rounded-dot
    * centroid (ties to the lowest cent_id — `cents` must be ascending by
    * id), then per-cell element-wise means over integer-quantized sums
    * (exact, order-free). `retain = false` drops memberless cells (the
    * training recurrence, ↔ the oracle's GROUP BY); `retain = true` keeps
    * their previous centroid — index REFRESH semantics (s34): a cell the
    * recent-vector reservoir never touched keeps serving its old list.
    */
  def lloydStep(
      train: Array[Array[Float]],
      cents: Seq[(Long, Array[Double])],
      retain: Boolean): Seq[(Long, Array[Double])] = {
    val dim = cents.head._2.length
    val sums = Array.fill(cents.length)(new Array[Long](dim))
    val counts = new Array[Long](cents.length)
    train.foreach { v =>
      // argmax over ascending cent_id with strict '>' → lowest id wins ties
      var best = 0
      var bestD = Double.NegativeInfinity
      var j = 0
      while (j < cents.length) {
        val d = r6d(dotD(v, cents(j)._2))
        if (d > bestD) { bestD = d; best = j }
        j += 1
      }
      counts(best) += 1
      val s = sums(best)
      var i = 0
      while (i < dim) { s(i) += math.floor(v(i).toDouble * 1e6 + 0.5).toLong; i += 1 }
    }
    cents.indices.collect {
      case j if counts(j) > 0 =>
        (cents(j)._1, sums(j).map(sq => sq.toDouble / (counts(j).toDouble * 1e6)))
      case j if retain =>
        (cents(j)._1, cents(j)._2)
    }
  }
}
