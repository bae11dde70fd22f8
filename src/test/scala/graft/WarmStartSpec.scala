package graft

import graft.streaming.StreamQuality.{decayFold, laplaceWeight}
import org.scalatest.funsuite.AnyFunSuite

/** s68's warm-start arithmetic, pinned where the streaming lifecycle
  * can't exercise it adversarially: epoch-0 continuity (a warm start
  * over an empty history must fit the SAME table as s66's cold fit)
  * and the decay fold's integer semantics.
  */
class WarmStartSpec extends AnyFunSuite {

  test("epoch-0 continuity: warm-start over an empty history is the cold fit, slot for slot") {
    // any census: decayFold(0, c) == c, so the fitted weight equals the
    // cold laplaceWeight of the raw epoch counts
    val censuses = Seq((0L, 0L), (1L, 0L), (0L, 1L), (17L, 3L), (1000L, 999L))
    censuses.foreach { case (p, n) =>
      assert(decayFold(0L, p) == p)
      assert(decayFold(0L, n) == n)
      assert(laplaceWeight(decayFold(0L, p), decayFold(0L, n)) == laplaceWeight(p, n))
    }
  }

  test("epoch-1 fold: floor(c0*7/8) + c1, exactly — the oracle's integer decay") {
    assert(decayFold(8L, 0L) == 7L)
    assert(decayFold(7L, 0L) == 6L) // floor, not round: 49/8 = 6.125
    assert(decayFold(1L, 0L) == 0L) // a single stale count decays away
    assert(decayFold(15L, 4L) == 13L + 4L)
    // repeated decay with no new evidence drains to zero (smooth, no resets)
    val drained = Iterator.iterate(100L)(decayFold(_, 0L)).drop(40).next()
    assert(drained == 0L)
  }

  test("drift semantics: a one-epoch swing moves the warm table LESS than a cold re-fit") {
    // history heavily positive (p=80,n=0), new epoch heavily negative
    // (p=0,n=40): cold re-fit flips the slot's sign; the warm fold keeps
    // the accumulated evidence in play and moves smoothly
    val (histP, histN) = (80L, 0L)
    val (epP, epN) = (0L, 40L)
    val prevWt = laplaceWeight(histP, histN)
    val coldWt = laplaceWeight(epP, epN)
    val warmWt = laplaceWeight(decayFold(histP, epP), decayFold(histN, epN))
    assert(prevWt > 0L && coldWt < 0L) // the cold monitor sign-flips
    assert(math.abs(warmWt - prevWt) < math.abs(coldWt - prevWt))
  }
}
