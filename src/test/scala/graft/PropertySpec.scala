package graft

import graft.ops.{FeatureOps, Folds}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants over seeded random inputs, evaluated in one
  * vectorized DataFrame pass (SURVEY.md §5.2.3): CLV/OLV ∈ [-1,1] when the
  * range guard passes, autocorr ∈ [-1,1], EMA(const)=const, clamp
  * idempotence, and engine-fold ≡ Scala-model equality on random series.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def series(n: Int): Seq[Double] = Seq.fill(n)(50.0 + rnd.nextDouble() * 100.0)
  private val cases: Seq[Seq[Double]] = (1 to 200).map(i => series(1 + rnd.nextInt(30)))

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

  test("engine folds equal the Scala model on 200 random series (exact)") {
    val df = cases.toDF("xs")
    val got = df
      .select(
        Folds.emaLR(col("xs"), 9).as("ema"),
        Folds.autocorrLag1(col("xs"), 1e-6).as("ac")
      )
      .as[(Double, Double)]
      .collect()
    cases.zip(got).foreach { case (xs, (ema, ac)) =>
      assert(ema == emaRef(xs, 9))
      assert(ac == acRef(xs))
      assert(ac >= -1.0 - 1e-9 && ac <= 1.0 + 1e-9)
    }
  }

  test("CLV/OLV bounded in [-1,1] whenever range >= tol") {
    val bars = (1 to 200).map { _ =>
      val lo = rnd.nextDouble() * 100
      val hi = lo + 1e-6 + rnd.nextDouble() * 10
      val c = lo + rnd.nextDouble() * (hi - lo)
      val o = lo + rnd.nextDouble() * (hi - lo)
      (o, hi, lo, c)
    }
    val got = bars
      .toDF("open", "high", "low", "close")
      .select(
        FeatureOps.clv(col("close"), col("high"), col("low")),
        FeatureOps.olv(col("open"), col("high"), col("low"))
      )
      .as[(Double, Double)]
      .collect()
    got.foreach { case (clv, olv) =>
      assert(clv >= -1.0 && clv <= 1.0)
      assert(olv >= -1.0 && olv <= 1.0)
    }
  }

  test("clamp is idempotent and bounded") {
    val vs = (1 to 200).map(_ => rnd.nextDouble() * 400 - 100)
    val got = vs
      .toDF("v")
      .select(
        FeatureOps.clamp(col("v"), 25.0, 175.0).as("c1"),
        FeatureOps.clamp(FeatureOps.clamp(col("v"), 25.0, 175.0), 25.0, 175.0).as("c2")
      )
      .as[(Double, Double)]
      .collect()
    got.foreach { case (c1, c2) =>
      assert(c1 == c2)
      assert(c1 >= 25.0 && c1 <= 175.0)
    }
  }

  test("EMA of constant series is the constant, for any period") {
    val df = (1 to 50).map(n => Seq.fill(1 + n)(73.25)).toDF("xs")
    Seq(2, 9, 21).foreach { p =>
      df.select(Folds.emaLR(col("xs"), p)).as[Double].collect().foreach(v => assert(v == 73.25))
    }
  }

  test("graft_shingles equals the Scala sliding-window model on 200 random word arrays") {
    val vocab = Vector("a", "bb", "ccc", "δδ", "e1", "f", "gg2", "日本", "i", "j")
    val wordCases: Seq[Seq[String]] =
      (1 to 200).map(_ => Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    val df = wordCases.toDF("ws")
    Seq(2, 3, 5).foreach { n =>
      val got = df
        .select(graft.ops.Hashing.shingles(col("ws"), n))
        .as[Seq[String]]
        .collect()
      wordCases.zip(got).foreach { case (ws, sh) =>
        val ref = if (ws.length < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq
        assert(sh == ref)
      }
    }
  }

  test("adaptivePlanes is monotone in n and keeps expected bucket size <= target until clamp") {
    import graft.ops.VectorOps._
    var prev = MinPlanes
    Seq(0L, 100L, 4096L, 4097L, 100000L, 1000000L, 10000000L, Long.MaxValue / 2).foreach { n =>
      val p = adaptivePlanes(n)
      assert(p >= prev, s"plane count must not shrink as n grows (n=$n)")
      assert(p >= MinPlanes && p <= MaxPlanes)
      if (p < MaxPlanes) assert(n <= (TargetBucketSize << p))
      prev = p
    }
  }

  test("Morton interleave round-trips and 16-blocks bound both dims to 4x4 quadrants") {
    // the mathematical basis of q115's skipping claim, proven for ALL
    // 8-bit inputs, not just the fixture: the z-key de-interleaves back
    // to exactly (x, y), and any two points sharing a 16-aligned key
    // block differ by at most 3 in EACH dimension (low 2 bits each).
    def morton(x: Int, y: Int): Long =
      (0 until 8).map(i => ((((x >> i) & 1) << (2 * i + 1)) + (((y >> i) & 1) << (2 * i))).toLong).sum
    def deinterleave(z: Long): (Int, Int) = {
      var x = 0; var y = 0
      (0 until 8).foreach { i =>
        x |= (((z >> (2 * i + 1)) & 1L) << i).toInt
        y |= (((z >> (2 * i)) & 1L) << i).toInt
      }
      (x, y)
    }
    val all = for (x <- 0 until 256; y <- 0 until 256) yield (x, y, morton(x, y))
    // bijection: every z-key distinct and round-trips
    assert(all.map(_._3).distinct.size == 256 * 256)
    all.foreach { case (x, y, z) => assert(deinterleave(z) == ((x, y))) }
    // quadrant bound: group by 16-aligned block, check both spans
    all.groupBy(_._3 >> 4).foreach { case (blk, pts) =>
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      assert(xs.max - xs.min <= 3, s"block $blk x-span ${xs.max - xs.min}")
      assert(ys.max - ys.min <= 3, s"block $blk y-span ${ys.max - ys.min}")
    }
  }
}
