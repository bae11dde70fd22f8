package graft

import graft.ops.Waterfill
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for q202's allocator — the algebra the DuckDB
  * oracle replays declaratively, pinned over RANDOM censuses instead of
  * only the fixture's: budget exactness, per-source caps, the
  * capped-prefix/water-level structure, the deterministic remainder
  * rule, and input-order independence (the property that makes the
  * driver-side collect safe: no dependence on partition arrival order).
  * Trials are seeded — the sweep is deterministic run to run.
  */
class WaterfillSpec extends AnyFunSuite {

  private def trials: Seq[(Seq[(String, Long)], Long)] = {
    val rnd = new scala.util.Random(0x47e5f111L)
    (0 until 500).map { _ =>
      val n = 1 + rnd.nextInt(40)
      val census = (0 until n).map(i => (f"src$i%02d", rnd.nextLong(10001L)))
      val budget = rnd.nextLong(250001L)
      (census, budget)
    }
  }

  test("sum(alloc) = min(budget, sum(avail)) and every alloc <= avail") {
    trials.foreach { case (census, budget) =>
      val out = Waterfill.allocate(census, budget)
      val total = census.map(_._2).sum
      assert(out.map(_.alloc).sum == math.min(budget, total),
        s"budget=$budget census=$census")
      assert(out.forall(a => a.alloc <= a.avail))
    }
  }

  test("capped set is a prefix of the ascending order and gets exactly its availability") {
    trials.foreach { case (census, budget) =>
      val out = Waterfill.allocate(census, budget)
      val firstUncapped = out.indexWhere(!_.capped)
      assert(firstUncapped == -1 || out.drop(firstUncapped).forall(!_.capped),
        s"capped set is not a prefix: budget=$budget census=$census")
      assert(out.filter(_.capped).forall(a => a.alloc == a.avail))
    }
  }

  test("water level: uncapped allocations differ by <= 1 and are >= every capped availability") {
    trials.foreach { case (census, budget) =>
      val out = Waterfill.allocate(census, budget)
      val un = out.filter(!_.capped).map(_.alloc)
      assert(un.isEmpty || (un.max - un.min) <= 1L,
        s"uncapped spread > 1: budget=$budget census=$census")
      val capMax = out.filter(_.capped).map(_.avail).maxOption.getOrElse(0L)
      assert(un.forall(_ >= capMax),
        s"water level below a capped source: budget=$budget census=$census")
    }
  }

  test("the allocation is independent of input order") {
    trials.foreach { case (census, budget) =>
      assert(
        Waterfill.allocate(census, budget) ==
          Waterfill.allocate(census.reverse, budget))
    }
  }

  test("remainder rule: the first rem mod slots uncapped sources in sort order get +1") {
    // a census with no capped sources and a non-dividing budget
    val census = Seq("a", "b", "c", "d", "e").map(s => (s, 100L))
    val out = Waterfill.allocate(census, 43L) // base 8, extra 3
    assert(out.map(_.alloc) == Seq(9L, 9L, 9L, 8L, 8L))
    assert(out.map(_.name) == Seq("a", "b", "c", "d", "e"))
  }
}
