package graft

import graft.ops.{IvfKMeans, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The trained IVF codebook must be bit-reproducible regardless of
  * physical partitioning — the quantized-integer centroid sums are the
  * mechanism (double sums would vary with Spark's partial-aggregation
  * order and could never match the DuckDB oracle).
  */
class IvfKMeansSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("driver-side r6d/dotD replay the Spark kernels bit-exactly (the q67 LUT contract)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 50).map(_ => Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val cent = Array.fill(16)(rnd.nextDouble() * 2 - 1)
    val sparkSide = vecs
      .toDF("v")
      .select(
        graft.ops.FeatureOps
          .r6(graft.ops.VectorOps.dot(col("v"), typedLit(cent.toSeq)))
          .as("d")
      )
      .as[Double]
      .collect()
    vecs.zip(sparkSide).foreach { case (v, d) =>
      assert(graft.ops.IvfKMeans.r6d(graft.ops.IvfKMeans.dotD(v, cent)) == d)
    }
  }

  test("codebook is bit-identical across partitionings and moves off the seed vectors") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir)
    def cb(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Double])] =
      IvfKMeans
        .codebook(spark, df)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq
        .sortBy(_._1)
    val trained = cb(e)
    assert(trained == cb(e.repartition(7)), "codebook must not depend on physical partitioning")

    val seeds = e
      .filter(org.apache.spark.sql.functions.col("vec_id") < IvfKMeans.K)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
      .toMap
    assert(
      trained.exists { case (id, cent) => seeds.get(id).exists(_ != cent) },
      "at least one centroid must move during training"
    )
  }
}
