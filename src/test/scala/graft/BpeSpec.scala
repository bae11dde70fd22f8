package graft

import graft.queries.TextQueries
import graft.sinks.DuckDbLive
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q180's BPE apply: merge-table well-formedness, the left-to-right
  * non-overlapping replace rule both engines must share, and the staged
  * oracle chain's equality with the Spark Column tree.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("merge table is well-formed: sides derivable in rank order, no duplicate pairs") {
    val seen = scala.collection.mutable.Set[(String, String)]()
    val results = scala.collection.mutable.Set[String]()
    TextQueries.bpeMerges.zipWithIndex.foreach { case ((x, y), i) =>
      Seq(x, y).foreach { s =>
        assert(s.length == 1 || results.contains(s),
          s"rank $i: side '$s' of ($x,$y) is neither a char nor an earlier merge's result")
      }
      assert(!seen.contains((x, y)), s"rank $i: duplicate pair ($x,$y)")
      seen += ((x, y)); results += x + y
    }
    assert(TextQueries.bpeMerges.size == 278)
  }

  private def sparkEncode(words: Seq[String]): Map[String, (String, Long)] = words
    .toDF("word")
    .select(col("word"), TextQueries.bpeEncode(col("word")).as("e"))
    .select(
      col("word"), col("e"),
      (length(col("e")) - length(expr("replace(e, '<', '')"))).cast("long").as("ntok"))
    .collect()
    .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
    .toMap

  test("overlap rule: '<a><a><a>' merges left-to-right to '<aa><a>' on both engines") {
    // classic BPE scans each rank left-to-right without re-matching the
    // just-built symbol; plain string replace implements exactly that —
    // but only if BOTH engines' replace() is left-to-right
    // non-overlapping, which this pins ('aa' is rank-less here, the
    // probe drives one replace directly)
    val sp = Seq("<a><a><a>")
      .toDF("s")
      .select(expr("replace(s, '<a><a>', '<aa>')"))
      .head().getString(0)
    assert(sp == "<aa><a>")
    assume(DuckDbLive.available, "duckdb_jdbc jar not in the offline cache")
    val dd = DuckDbLive.withConnection("") { c =>
      DuckDbLive.queryRows(c, "SELECT replace('<a><a><a>', '<a><a>', '<aa>')")
    }.head.head
    assert(dd == "<aa><a>")
  }

  test("fixture-vocab encodings: frequent words one token, the five held-out words two") {
    val enc = sparkEncode(Seq(
      "the", "stream", "customer", "column", "vector", "query", "dup", "qy"))
    assert(enc("the") == (("<the>", 1L)))
    assert(enc("stream") == (("<stream>", 1L)))
    assert(enc("customer") == (("<custom><er>", 2L)))
    assert(enc("column") == (("<co><lumn>", 2L)))
    assert(enc("vector") == (("<vec><tor>", 2L)))
    assert(enc("query") == (("<qu><ery>", 2L)))
    assert(enc("dup") == (("<du><p>", 2L)))
    // out-of-table letter pair: falls back to per-char symbols
    assert(enc("qy") == (("<q><y>", 2L)))
  }

  test("staged oracle chain equals the Spark Column tree word-for-word") {
    // the oracle splits the 278 ranks into <=90-deep CTE stages (DuckDB
    // binder recursion cap is 128); staging must not change semantics —
    // drive both engines over the fixture vocab + adversarial extras
    val words = Seq(
      "join", "hash", "row", "batch", "scan", "customer", "column",
      "filter", "small", "slow", "merge", "order", "vector", "line",
      "data", "table", "agg", "value", "key", "stream", "window",
      "spark", "a", "group", "part", "big", "sort", "query", "fast",
      "the", "dup", "aaa", "thethe", "erer", "sparkspark")
    val sp = sparkEncode(words)
    assume(DuckDbLive.available, "duckdb_jdbc jar not in the offline cache")
    val vals = words.map(w => s"('$w')").mkString(", ")
    val sql = s"""WITH vocab AS (SELECT word FROM (VALUES $vals) t(word)),
      ${TextQueries.bpeStagedCtes("regexp_replace(word, '(.)', '<\\1>', 'g')", "vocab")}
      SELECT word, e FROM enc"""
    val dd = DuckDbLive.withConnection("") { c =>
      DuckDbLive.queryRows(c, sql)
    }.map(r => r(0).toString -> r(1).toString).toMap
    words.foreach { w =>
      assert(dd(w) == sp(w)._1, s"engines diverge on '$w': duck=${dd(w)} spark=${sp(w)._1}")
    }
  }
}
