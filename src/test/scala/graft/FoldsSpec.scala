package graft

import graft.ops.Folds
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fold semantics vs plain-Scala reference models implementing the
  * reference recurrences (Common.cs:14-60, NT EMA semantics at
  * StrategyAnalyzerExporter.cs:138-139). Comparisons are exact (==):
  * the engine folds are defined to be bit-identical to a left-to-right
  * Scala fold.
  */
class FoldsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference model: seed-first EMA fold. */
  private def emaRef(xs: Seq[Double], period: Int): Double = {
    val k = 2.0 / (period + 1.0)
    val omk = 1.0 - k
    xs.tail.foldLeft(xs.head)((acc, x) => acc * omk + x * k)
  }

  /** Reference model: lag-1 autocorrelation, Common.cs:29-60 (tol 1e-6). */
  private def acRef(xs: Seq[Double]): Double = {
    val n = xs.length
    if (n <= 1) return 0.0
    val mu = xs.foldLeft(0.0)(_ + _) / n
    val num = (1 until n).map(i => (xs(i) - mu) * (xs(i - 1) - mu)).foldLeft(0.0)(_ + _)
    val den = xs.map(x => (x - mu) * (x - mu)).foldLeft(0.0)(_ + _)
    if (math.abs(den) < 1e-6) 0.0 else num / den
  }

  private def runEma(xs: Seq[Double], p: Int): Double =
    Seq(xs).toDF("xs").select(Folds.emaLR(col("xs"), p)).as[Double].head()

  private def runAc(xs: Seq[Double]): Double =
    Seq(xs).toDF("xs").select(Folds.autocorrLag1(col("xs"), 1e-6)).as[Double].head()

  test("emaLR matches the seed-first recurrence exactly") {
    val xs = Seq(100.0, 101.5, 99.25, 102.125, 98.5, 100.0625, 101.0)
    assert(runEma(xs, 9) == emaRef(xs, 9))
    assert(runEma(xs, 21) == emaRef(xs, 21))
  }

  test("emaLR of a constant series is the constant") {
    val xs = Seq.fill(25)(42.5)
    assert(runEma(xs, 9) == 42.5)
  }

  test("emaLR of a single element is that element") {
    assert(runEma(Seq(7.25), 9) == 7.25)
  }

  test("autocorrLag1 matches the reference two-pass formula exactly") {
    val xs = Seq(1.0, 2.5, 2.0, 3.5, 3.0, 4.5, 4.0)
    assert(runAc(xs) == acRef(xs))
  }

  test("autocorrLag1 guards: n<=1 and constant series give 0.0") {
    assert(runAc(Seq(5.0)) == 0.0)
    assert(runAc(Seq.fill(10)(3.25)) == 0.0) // den < 1e-6, Common.cs:59
  }

  test("autocorrLag1 of strictly alternating series is negative, in [-1,1]") {
    val xs = (0 until 20).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val r = runAc(xs)
    assert(r < 0 && r >= -1.0 && r <= 1.0)
  }

  test("sumZ is the zero-seeded left fold") {
    val xs = Seq(0.1, 0.2, 0.3)
    val got = Seq(xs).toDF("xs").select(Folds.sumZ(col("xs"))).as[Double].head()
    assert(got == xs.foldLeft(0.0)(_ + _))
  }
}
