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
