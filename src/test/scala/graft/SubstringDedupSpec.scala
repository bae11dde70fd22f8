package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q179's reason to exist, demonstrated: a passage duplicated at an
  * offset INSIDE q125's stride escapes fixed 32-word/stride-24 chunk
  * digests entirely, while the stride-1 K-gram kernel reports it with
  * the exact span arithmetic (a run of L-K+1 flagged positions ⇒
  * longest duplicated span L).
  */
class SubstringDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // doc 1 = a 40-word passage; doc 2 = 10 filler words, then the same
  // passage — offset 10, inside q125's stride of 24
  private val passage = (0 until 40).map(i => s"a$i")
  private val docs = Seq(
    (1L, passage.mkString(" ")),
    (2L, ((0 until 10).map(i => s"f$i") ++ passage).mkString(" "))
  ).toDF("doc_id", "text")

  test("q125's stride-24 chunk digests miss the offset-10 duplicate") {
    // the q125 chunk kernel shape, verbatim (32-word chunks, stride 24)
    val ws = split(col("text"), " ")
    val chunks = docs
      .select(
        col("doc_id"),
        col("text"),
        posexplode(sequence(lit(0), size(ws) - 1, lit(24))).as(Seq("chunk_id", "start")))
      .select(
        col("doc_id"),
        md5(to_binary(concat_ws(" ", slice(ws, col("start") + 1, lit(32))), lit("utf-8")))
          .as("h"))
    val crossDocDups = chunks
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .count()
    // every doc-2 chunk starts 10 words into the passage relative to the
    // doc-1 chunk grid, so no digest repeats — the modality gap q179 closes
    assert(crossDocDups == 0L)
  }

  test("q179's stride-1 K-grams report the full 40-token span at offset 10") {
    val rows = DedupQueries
      .substringDupStats(docs, 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // doc 1: 40-16+1 = 25 grams, all first occurrences.
    // doc 2: 50-16+1 = 35 grams; the 25 grams fully inside the passage
    // (positions 11..35) are dups — one run ⇒ span 25+15 = 40, the exact
    // passage length; dup_bp = 25·10⁴ div 35 = 7142.
    assert(rows == Seq(
      (1L, 25L, 0L, 0L, 0L),
      (2L, 35L, 25L, 7142L, 40L)
    ))
  }

  test("idempotence: a corpus with the dup span removed reports no dups") {
    // drop doc 2's duplicated passage (keep its filler) and re-run: the
    // first-occurrence rule must find nothing — the q125 discipline,
    // carried to stride 1 (re-running dedup on deduped output is a no-op)
    val cleaned = Seq(
      (1L, passage.mkString(" ")),
      (2L, ((0 until 10).map(i => s"f$i") ++ (0 until 16).map(i => s"g$i")).mkString(" "))
    ).toDF("doc_id", "text")
    val rows = DedupQueries
      .substringDupStats(cleaned, 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSeq
    assert(rows == Seq((1L, 0L), (2L, 0L)))
  }
}
