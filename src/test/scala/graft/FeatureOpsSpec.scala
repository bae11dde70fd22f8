package graft

import graft.ops.FeatureOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar feature guards — every guard branch of Price.cs:24-38,
  * MovingAverage.cs:35-48, Common.cs:8-27, plus the deterministic
  * rounding helper.
  */
class FeatureOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c).as[Double].head()

  test("clv basic value and [-1,1] bounds") {
    // close at high → +1; close at low → -1; mid → 0
    assert(one(FeatureOps.clv(lit(10.0), lit(10.0), lit(8.0))) == 1.0)
    assert(one(FeatureOps.clv(lit(8.0), lit(10.0), lit(8.0))) == -1.0)
    assert(one(FeatureOps.clv(lit(9.0), lit(10.0), lit(8.0))) == 0.0)
  }

  test("clv/olv zero-range guard (Price.cs:28,36)") {
    assert(one(FeatureOps.clv(lit(10.0), lit(10.0), lit(10.0))) == 0.0)
    assert(one(FeatureOps.olv(lit(10.0), lit(10.0), lit(10.0))) == 0.0)
    // range just under tol
    assert(one(FeatureOps.clv(lit(10.0), lit(10.0), lit(10.0 - 1e-7))) == 0.0)
  }

  test("olv basic value") {
    assert(one(FeatureOps.olv(lit(10.0), lit(10.0), lit(8.0))) == 1.0)
  }

  test("maDistance value and guards (MovingAverage.cs:41-45)") {
    assert(one(FeatureOps.maDistance(lit(110.0), lit(100.0))) == 10.0)
    assert(one(FeatureOps.maDistance(lit(110.0), lit(0.0))) == 0.0) // |ma|<tol
    assert(one(FeatureOps.maDistance(lit(110.0), lit(1e-7))) == 0.0)
    assert(one(FeatureOps.maDistance(lit(Double.NaN), lit(100.0))) == 0.0)
    assert(one(FeatureOps.maDistance(lit(110.0), lit(Double.NaN))) == 0.0)
    assert(one(FeatureOps.maDistance(lit(110.0), lit(Double.PositiveInfinity))) == 0.0)
    assert(one(FeatureOps.maDistance(lit(Double.NegativeInfinity), lit(100.0))) == 0.0)
  }

  test("slopePct value and guards (Common.cs:17,23)") {
    assert(one(FeatureOps.slopePct(lit(100.0), lit(110.0), lit(5))) == 10.0)
    assert(one(FeatureOps.slopePct(lit(100.0), lit(110.0), lit(1))) == 0.0) // n<2
    assert(one(FeatureOps.slopePct(lit(1e-7), lit(110.0), lit(5))) == 0.0) // |first|<tol
    // the reference's accidental tolerance=14 call (MovingAverage.cs:30,
    // SURVEY.md §2.4.1) stays reproducible:
    assert(one(FeatureOps.slopePct(lit(10.0), lit(11.0), lit(5), tol = 14.0)) == 0.0)
  }

  test("clamp (Common.cs:8-11)") {
    assert(one(FeatureOps.clamp(lit(200.0), 25.0, 175.0)) == 175.0)
    assert(one(FeatureOps.clamp(lit(1.0), 25.0, 175.0)) == 25.0)
    assert(one(FeatureOps.clamp(lit(99.0), 25.0, 175.0)) == 99.0)
  }

  test("r6 is deterministic 6-decimal rounding (ties resolve by the binary value, same on every engine)") {
    // 0.5186875*1e6 is fractionally below the tie in binary → floors down;
    // what matters is that BOTH engines compute this same value (plain
    // round() would give 0.518688 on Spark and 0.518687 on DuckDB here).
    assert(one(FeatureOps.r6(lit(0.5186875))) == 0.518687)
    assert(one(FeatureOps.r6(lit(1.2345674))) == 1.234567)
    assert(one(FeatureOps.r6(lit(1.2345676))) == 1.234568)
  }
}
