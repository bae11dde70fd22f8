package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming state-boundedness MEASURED, not asserted from scaladoc: the
  * s25 timer demo's own progress metrics must show (a) state rows
  * bounded by open (user, day) pairs — the corpus-size-independent
  * shape the 100 TB claim rests on — and (b) eviction actually
  * happening (final batch holds fewer rows than the peak, because fired
  * timers removed their day entries).
  */
class StateBoundSpec extends AnyFunSuite {

  test("s25 timer state is bounded by users × day-span and evicts on finalize") {
    val dir = "/root/testdata/sf0.001"
    // run the demo (also exercised by Verify; cheap at sf0.001)
    SparkEntry.queries("s25_timer_finalize")(TestSpark.spark, dir).collect()
    val peak = graft.streaming.StateV2.s25PeakStateRows.get()
    val fin = graft.streaming.StateV2.s25FinalStateRows.get()
    assert(peak > 0L, "progress metrics must report state rows")
    // sf0.001 fixture: 15 users × ≤31 distinct days, plus a timer row
    // per open day in the timer column family ⇒ well under 2 × 15 × 31.
    // CORPUS rows are ~1e4 — a state leak that buffered events rather
    // than (user, day) aggregates blows this bound immediately.
    assert(peak <= 2L * 15L * 31L, s"state rows $peak exceed the open-pairs bound")
    assert(fin < peak, s"final state $fin did not shrink below peak $peak — timers never evicted")
  }

  test("s27 join state is range-bounded and watermark-evicted") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("s27_stream_outer_join")(TestSpark.spark, dir).collect()
    val peak = graft.streaming.StreamJoins.s27PeakStateRows.get()
    val fin = graft.streaming.StreamJoins.s27FinalStateRows.get()
    info(s"s27 join state: peak=$peak final=$fin")
    assert(peak > 0L, "progress metrics must report join state rows")
    // sf0.001: ~1000 events → both sides unfiltered would buffer ~1260
    // logical rows ≈ 2500+ store rows (the symmetric join keeps two
    // stores per side). The watermark + 12 h range condition must keep
    // the peak WELL below that buffer-everything figure, and the final
    // batch (after eviction, replay dropped) well below the peak.
    assert(peak < 1200L, s"peak join state $peak is not range-bounded")
    assert(fin < peak, s"final state $fin did not shrink below peak $peak — no eviction")
  }
}
