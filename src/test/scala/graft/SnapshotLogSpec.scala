package graft

import graft.sinks.{DuckDbLive, SnapshotLog}
import org.scalatest.funsuite.AnyFunSuite

/** s39's commit protocol under adversarial schedules — the properties
  * the in-query lifecycle can't exercise: a REAL concurrent race for
  * the pointer (not just a stale re-delivery), and log-only isolation
  * of historical snapshots.
  */
class SnapshotLogSpec extends AnyFunSuite {

  private def withLog(f: String => Unit): Unit = {
    assume(DuckDbLive.available, "duckdb_jdbc jar not in the offline cache")
    val base = java.nio.file.Files.createTempDirectory("graft_s39_spec_")
    try f(s"$base/log.duckdb")
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("stale-parent commit is rejected and leaves no log rows") {
    withLog { db =>
      SnapshotLog.initLog(db)
      assert(SnapshotLog.commit(db, 0L, 1L, Seq(("f1", 10L), ("f2", 5L))))
      assert(SnapshotLog.commit(db, 1L, 2L, Seq(("f1", 10L), ("f2", 5L), ("f3", 7L))))
      // a writer still at snapshot 1: clean reject, nothing written
      assert(!SnapshotLog.commit(db, 1L, 3L, Seq(("f4", 1L))))
      assert(SnapshotLog.currentSnapshot(db) == 2L)
      assert(SnapshotLog.manifest(db, 3L).isEmpty)
    }
  }

  test("time travel: snapshot 1's manifest never sees snapshot 2's files") {
    withLog { db =>
      SnapshotLog.initLog(db)
      SnapshotLog.commit(db, 0L, 1L, Seq(("a", 3L)))
      SnapshotLog.commit(db, 1L, 2L, Seq(("a", 3L), ("b", 4L)))
      assert(SnapshotLog.manifest(db, 1L) == Seq(("a", 3L)))
      assert(SnapshotLog.manifest(db, 2L) == Seq(("a", 3L), ("b", 4L)))
    }
  }

  test("4-way race on the same parent: exactly one commit wins, losers leave nothing") {
    withLog { db =>
      SnapshotLog.initLog(db)
      assert(SnapshotLog.commit(db, 0L, 1L, Seq(("base", 1L))))
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(4)
      val gate = new CountDownLatch(1)
      val results = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            // each racer proposes its own snapshot id built on parent 1
            SnapshotLog.commit(db, 1L, 10L + i, Seq((s"race$i", 1L)))
          }
        })
      }
      gate.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      val wins = results.map(_.get()).count(identity)
      assert(wins == 1, s"expected exactly one winning commit, got $wins")
      val cur = SnapshotLog.currentSnapshot(db)
      assert(cur >= 10L && cur < 14L)
      // the winner's manifest is intact; every loser left zero rows
      assert(SnapshotLog.manifest(db, cur).size == 1)
      (10L until 14L).filter(_ != cur).foreach { l =>
        assert(SnapshotLog.manifest(db, l).isEmpty, s"loser $l leaked manifest rows")
      }
    }
  }
}
