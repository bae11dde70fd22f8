package graft

import graft.ops.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vector fold semantics vs left-to-right Scala reference. */
class VectorOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val a = Seq(1.0f, -2.0f, 3.5f, 0.25f)
  private val b = Seq(0.5f, 4.0f, -1.0f, 8.0f)

  private def dotRef(x: Seq[Float], y: Seq[Float]): Double =
    x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.foldLeft(0.0)(_ + _)

  test("dot matches the ordered fold exactly") {
    val got = Seq((a, b)).toDF("a", "b").select(VectorOps.dot(col("a"), col("b"))).as[Double].head()
    assert(got == dotRef(a, b))
  }

  test("cosine of a vector with itself is 1 (within fp), of orthogonal is 0") {
    val got = Seq((a, a)).toDF("a", "b").select(VectorOps.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
    val e1 = Seq(1.0f, 0.0f); val e2 = Seq(0.0f, 1.0f)
    val g2 = Seq((e1, e2)).toDF("a", "b").select(VectorOps.cosine(col("a"), col("b"))).as[Double].head()
    assert(g2 == 0.0)
  }

  test("adaptivePlanes grows the bucket count with the corpus and clamps to [8, 20]") {
    import graft.ops.VectorOps._
    assert(adaptivePlanes(0L) == 8)
    assert(adaptivePlanes(500L) == 8) // sf0.01 corpus → unchanged vs fixed-8
    assert(adaptivePlanes(2000L) == 8) // sf0.1 corpus → unchanged vs fixed-8
    assert(adaptivePlanes(16L << 8) == 8) // exactly at the 8-plane capacity
    assert(adaptivePlanes((16L << 8) + 1) == 9) // one past → 9 planes
    assert(adaptivePlanes(16L << 12) == 12)
    assert(adaptivePlanes(Long.MaxValue / 4) == 20) // clamped at MaxPlanes
    // invariant: healthy expected bucket size ≤ TargetBucketSize until clamp
    (8 to 19).foreach { p =>
      val n = 16L << p
      assert(n <= (TargetBucketSize << adaptivePlanes(n)))
    }
  }

  test("signBucket sets bit j-1 iff dim j is positive") {
    val v = Seq(1.0f, -1.0f, 2.0f, 0.0f, 5.0f, -3.0f, 1.0f, -1.0f)
    val got = Seq(v).toDF("e").select(VectorOps.signBucket(col("e"), 8)).as[Long].head()
    // dims 1,3,5,7 positive → bits 0,2,4,6 → 1+4+16+64
    assert(got == 85L)
  }
}
