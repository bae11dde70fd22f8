package graft

import graft.model.FeaturesConfig
import graft.pipeline.Features
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** End-to-end pipeline vs a plain-Scala model of the reference semantics:
  * day bars → capped seed-first EMA folds → trailing-21 slope/autocorr →
  * warm-up ≥ 20 (FeaturesBarService.cs:22-47, Common.cs:14-60). The model
  * reimplements every fold with the identical left-to-right operation
  * order, so comparisons are exact.
  */
class FeaturesPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = FeaturesConfig()

  // One user, 25 consecutive days, one event per day at 10:00, prices
  // drifting with a deterministic wobble.
  private val prices = (0 until 25).map(i => 100.0 + i + (if (i % 3 == 0) 1.25 else -0.75))
  private val events = prices.zipWithIndex.map { case (p, i) =>
    (1L, Timestamp.valueOf(f"2024-01-${i + 1}%02d 10:00:00"), p)
  }

  private def emaRef(xs: Seq[Double], period: Int): Double = {
    val k = 2.0 / (period + 1.0); val omk = 1.0 - k
    xs.tail.foldLeft(xs.head)((acc, x) => acc * omk + x * k)
  }
  private def acRef(xs: Seq[Double]): Double = {
    val n = xs.length
    if (n <= 1) return 0.0
    val mu = xs.foldLeft(0.0)(_ + _) / n
    val num = (1 until n).map(i => (xs(i) - mu) * (xs(i - 1) - mu)).foldLeft(0.0)(_ + _)
    val den = xs.map(x => (x - mu) * (x - mu)).foldLeft(0.0)(_ + _)
    if (math.abs(den) < 1e-6) 0.0 else num / den
  }
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("featuresFull matches the Scala reference model row for row") {
    val df = events.toDF("user_id", "ts", "value")
    val got = Features
      .featuresFull(df, cfg)
      .select(
        "Day", "Close", "F_MovingAverageDistance", "F_MovingAverageSlope",
        "F_MovingAverageAutocorrelation", "F_CloseLocationValue", "Volume"
      )
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect()

    // warm-up: rows 20..25 (1-indexed) → 6 rows
    assert(got.length == prices.length - cfg.barsRequiredToTrade + 1)

    val emaF = prices.indices.map(i => emaRef(prices.slice(0, i + 1), 9))
    got.zipWithIndex.foreach { case ((day, close, maDist, slope, ac, clv, vol), gi) =>
      val i = gi + cfg.barsRequiredToTrade - 1 // 0-based bar index
      assert(day == 20240101L + i)
      assert(close == prices(i))
      assert(vol == 1.0)
      // single-event day bars: high==low → CLV guard
      assert(clv == 0.0)
      val e = emaF(i)
      assert(maDist == r6((close - e) / e * 100.0))
      val buf = emaF.slice(i - 20, i + 1)
      assert(slope == r6((buf.last - buf.head) / buf.head * 100.0))
      assert(ac == r6(acRef(buf)))
    }
  }

  test("warm-up boundary: exactly barsRequiredToTrade rows needed") {
    val df = events.take(19).toDF("user_id", "ts", "value")
    assert(Features.featuresFull(df, cfg).count() == 0)
    val df20 = events.take(20).toDF("user_id", "ts", "value")
    assert(Features.featuresFull(df20, cfg).count() == 1)
  }

  test("featuresF32 downcasts feature doubles to float, keeps codes long") {
    val df = events.toDF("user_id", "ts", "value")
    val sch = Features.featuresF32(df, cfg).schema
    import org.apache.spark.sql.types._
    assert(sch("Close").dataType == FloatType)
    assert(sch("F_MovingAverageSlope").dataType == FloatType)
    assert(sch("Day").dataType == LongType)
    assert(sch("Time").dataType == LongType)
  }
}
