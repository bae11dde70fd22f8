package graft

import graft.queries.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants for the q168/q175/s37 packing kernel
  * (docSpansOf + packedSegments) over seeded random corpora the fixture
  * can't produce: zero-token docs, non-contiguous doc_ids spanning
  * several 1024-doc blocks, sources of wildly different sizes. Checks
  * a full Scala reference model (per-source prefix sums + window
  * chopping) and the structural facts a trainer relies on: each doc's
  * segments sum to its token count with exactly one is_doc_start, and
  * every window except a source's last is packed to exactly W tokens
  * with contiguous, disjoint segments from offset 0.
  */
class PackingInvariantSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val W = 256L
  private val rnd = new scala.util.Random(1414)

  // (source, doc_id, toks): ~4 sources, ids scattered across blocks,
  // ~8% zero-token docs
  private val corpus: Seq[(String, Long, Long)] = {
    val ids = rnd.shuffle((0L until 6000L).toList).take(900).sorted
    ids.map { id =>
      val src = s"s${rnd.nextInt(4)}"
      val toks = if (rnd.nextInt(12) == 0) 0L else 1L + rnd.nextInt(700).toLong
      (src, id, toks)
    }
  }

  private def referenceSegments(
      docs: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long, Long, Boolean)] =
    docs
      .groupBy(_._1)
      .flatMap { case (src, ds) =>
        var off = 0L
        ds.sortBy(_._2).flatMap { case (_, id, toks) =>
          val strt = off
          off += toks
          if (toks == 0L) Nil
          else {
            val e = strt + toks
            (strt / W to (e - 1) / W).map { w =>
              val segStart = math.max(strt, w * W) - w * W
              val segLen = math.min(e, (w + 1) * W) - math.max(strt, w * W)
              (src, w, id, segStart, segLen, w == strt / W)
            }
          }
        }
      }
      .toSet

  private lazy val got: Seq[(String, Long, Long, Long, Long, Boolean)] =
    TextQueries
      .packedSegments(TextQueries.docSpansOf(corpus.toDF("source", "doc_id", "toks")))
      .as[(String, Long, Long, Long, Long, Boolean)]
      .collect()
      .toSeq

  test("packing kernel equals the Scala reference model on a scattered random corpus") {
    assert(got.toSet == referenceSegments(corpus))
    assert(got.size == got.toSet.size, "no duplicate segments")
  }

  test("each doc's segments sum to its token count with exactly one is_doc_start") {
    val byDoc = got.groupBy(t => (t._1, t._3))
    corpus.filter(_._3 > 0).foreach { case (src, id, toks) =>
      val segs = byDoc.getOrElse((src, id), Nil)
      assert(segs.map(_._5).sum == toks, s"doc $src/$id segment lengths must sum to $toks")
      assert(segs.count(_._6) == 1, s"doc $src/$id must have exactly one is_doc_start")
    }
  }

  test("every window but a source's last is packed to exactly W, contiguous from 0") {
    got.groupBy(t => (t._1, t._2)).foreach { case ((src, w), segs) =>
      val lastW = got.filter(_._1 == src).map(_._2).max
      val sorted = segs.sortBy(_._4)
      // contiguous + disjoint: each segment starts where the previous ended
      sorted.foldLeft(0L) { case (expect, (_, _, _, segStart, segLen, _)) =>
        assert(segStart == expect, s"window $src/$w must have contiguous segments")
        segStart + segLen
      }
      if (w < lastW)
        assert(sorted.map(_._5).sum == W, s"non-final window $src/$w must hold exactly $W tokens")
      else
        assert(sorted.map(_._5).sum <= W)
    }
  }
}
