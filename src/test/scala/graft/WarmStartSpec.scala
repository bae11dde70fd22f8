package graft

import graft.streaming.StreamQuality.{decayFoldBy, decayFoldNeg, decayFoldPos, laplaceWeight}
import org.scalatest.funsuite.AnyFunSuite

/** s68's warm-start arithmetic, pinned where the streaming lifecycle
  * can't exercise it adversarially: epoch-0 continuity (a warm start
  * over an empty history must fit the SAME table as s66's cold fit, at
  * BOTH per-label keep rates), the decay folds' integer semantics, and
  * the property the per-label budgets exist for — the rare label's
  * evidence outliving the abundant label's.
  */
class WarmStartSpec extends AnyFunSuite {

  test("epoch-0 continuity: warm-start over an empty history is the cold fit, slot for slot, at BOTH label rates") {
    // any census: fold(0, c) == c at any keep ratio, so the fitted
    // weight equals the cold laplaceWeight of the raw epoch counts
    val censuses = Seq((0L, 0L), (1L, 0L), (0L, 1L), (17L, 3L), (1000L, 999L))
    censuses.foreach { case (p, n) =>
      assert(decayFoldPos(0L, p) == p)
      assert(decayFoldNeg(0L, n) == n)
      assert(laplaceWeight(decayFoldPos(0L, p), decayFoldNeg(0L, n)) == laplaceWeight(p, n))
    }
  }

  test("per-label folds: floor(c0·15/16)+c1 for positives, floor(c0·3/4)+c1 for negatives — the oracle's integer decays") {
    // positive (long-memory) rate
    assert(decayFoldPos(16L, 0L) == 15L)
    assert(decayFoldPos(15L, 0L) == 14L) // floor, not round: 225/16 = 14.06
    assert(decayFoldPos(1L, 0L) == 0L) // a single stale count decays away
    assert(decayFoldPos(17L, 4L) == 15L + 4L)
    // negative (short-memory) rate
    assert(decayFoldNeg(4L, 0L) == 3L)
    assert(decayFoldNeg(3L, 0L) == 2L) // floor: 9/4 = 2.25
    assert(decayFoldNeg(1L, 0L) == 0L)
    assert(decayFoldNeg(15L, 4L) == 11L + 4L)
    // repeated decay with no new evidence drains to zero at both rates
    // (smooth, no resets) — the long memory just takes longer
    assert(Iterator.iterate(100L)(decayFoldPos(_, 0L)).drop(120).next() == 0L)
    assert(Iterator.iterate(100L)(decayFoldNeg(_, 0L)).drop(40).next() == 0L)
  }

  test("the budget property: the rare label's evidence OUTLIVES the abundant label's at every step") {
    // same starting mass, no new evidence: the 15/16 memory dominates
    // the 3/4 memory strictly until both drain — the reason per-label
    // budgets exist (an imbalanced stream must not wash out its scarce
    // positive history at the majority class's rate)
    val pos = Iterator.iterate(100L)(decayFoldPos(_, 0L)).take(30).toSeq
    val neg = Iterator.iterate(100L)(decayFoldNeg(_, 0L)).take(30).toSeq
    pos.zip(neg).tail.foreach { case (p, n) => assert(p >= n) }
    assert(pos(15) > 0L && neg(15) == 0L) // after 15 quiet epochs only the rare label remembers
  }

  test("drift semantics: a one-epoch swing moves the warm table LESS than a cold re-fit") {
    // history heavily positive (p=80,n=0), new epoch heavily negative
    // (p=0,n=40): cold re-fit flips the slot's sign; the warm fold keeps
    // the accumulated evidence in play and moves smoothly
    val (histP, histN) = (80L, 0L)
    val (epP, epN) = (0L, 40L)
    val prevWt = laplaceWeight(histP, histN)
    val coldWt = laplaceWeight(epP, epN)
    val warmWt = laplaceWeight(decayFoldPos(histP, epP), decayFoldNeg(histN, epN))
    assert(prevWt > 0L && coldWt < 0L) // the cold monitor sign-flips
    assert(math.abs(warmWt - prevWt) < math.abs(coldWt - prevWt))
  }

  test("decayFoldBy is the one fold both label rates delegate to") {
    assert(decayFoldBy(56L, 3L, 15L, 16L) == decayFoldPos(56L, 3L))
    assert(decayFoldBy(56L, 3L, 3L, 4L) == decayFoldNeg(56L, 3L))
  }
}
