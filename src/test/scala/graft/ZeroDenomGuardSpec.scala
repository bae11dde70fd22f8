package graft

import graft.queries.TextQueries
import graft.sinks.DuckDbLive
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q162/q171 engine-shape-divergence class, closed for q172/q169:
  * integer division by zero is NULL in Spark but an ERROR in DuckDB, so
  * an unguarded denominator that is only ever nonzero on the CURRENT
  * fixture is a latent cross-engine break (a degenerate source whose
  * docs are all empty text). The fixture has no such source, so the
  * oracle gate can't exercise the guard — this spec drives the exact
  * production expressions (`TextQueries.rBpSql` / `epochsX100Sql`, the
  * strings q172/q169 compile) over a zero-denominator row on BOTH
  * engines and pins the agreed closed form.
  */
class ZeroDenomGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("q172 r_bp: zero-token source rates 0 on both engines, no NULL, no error") {
    // (src_tokens, target_tokens): the degenerate empty source and a
    // live one whose uncapped rate exceeds the 10^4 cap.
    val sp = Seq((0L, 0L), (100L, 50L), (10L, 100L))
      .toDF("src_tokens", "target_tokens")
      .select(expr(TextQueries.rBpSql("div")).as("r_bp"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
      .toSeq
    assert(sp == Seq(0L, 5000L, 10000L))

    assume(DuckDbLive.available, "duckdb_jdbc jar not in the offline cache")
    val dd = DuckDbLive.withConnection("") { c =>
      DuckDbLive
        .queryRows(c,
          s"""SELECT ${TextQueries.rBpSql("//")} AS r_bp
            FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                         (CAST(100 AS BIGINT), CAST(50 AS BIGINT)),
                         (CAST(10 AS BIGINT), CAST(100 AS BIGINT)))
              t(src_tokens, target_tokens)""")
        .map(_.head.asInstanceOf[Number].longValue)
    }
    assert(dd == Seq(0L, 5000L, 10000L))
  }

  test("q169 epochs_x100: zero-token source reads 0 epochs on both engines") {
    // (n_tokens, w, tt, tw): the empty source (w = sqrt(0) = 0) next to
    // a live source holding the whole weight.
    val sp = Seq((0L, 0L, 400L, 20L), (400L, 20L, 400L, 20L))
      .toDF("n_tokens", "w", "tt", "tw")
      .select(expr(TextQueries.epochsX100Sql("div")).as("e"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
      .toSeq
    assert(sp == Seq(0L, 100L))

    assume(DuckDbLive.available, "duckdb_jdbc jar not in the offline cache")
    val dd = DuckDbLive.withConnection("") { c =>
      DuckDbLive
        .queryRows(c,
          s"""SELECT ${TextQueries.epochsX100Sql("//")} AS e
            FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                          CAST(400 AS BIGINT), CAST(20 AS BIGINT)),
                         (CAST(400 AS BIGINT), CAST(20 AS BIGINT),
                          CAST(400 AS BIGINT), CAST(20 AS BIGINT)))
              t(n_tokens, w, tt, tw)""")
        .map(_.head.asInstanceOf[Number].longValue)
    }
    assert(dd == Seq(0L, 100L))
  }

  test("q174/q177 summary mean: negative sums divide identically on both engines") {
    // q177's int8−int4 delta rows come from two INDEPENDENT rankings,
    // so their sum — unlike q174's structurally-≥0 P2−P1 superset
    // delta — can go negative, where integer-division semantics stop
    // being fixture-shadowed. MEASURED here: Spark `div` and DuckDB
    // `//` BOTH truncate toward zero (-4/3 → -1, not floor's -2;
    // -5/20 → 0, not -1), so the bare shared form
    // (SimQueries.meanBpSql) is cross-engine exact as-is. This pin
    // exists so a future "fix" adding a floor guard to ONE side — the
    // q162 divergence class — fails loudly instead of passing on a
    // nonnegative fixture.
    def spMean(vals: Seq[Long]): Long = vals
      .toDF("recall_bp")
      .agg(expr(graft.queries.SimQueries.meanBpSql("div")).as("m"))
      .collect()(0).getLong(0)
    assert(spMean(Seq(-5L, 0L, 1L)) == -1L) // trunc(-4/3), floor would be -2
    assert(spMean(Seq(5L, 0L, 1L)) == 2L)
    assert(spMean(Seq(-5L, 0L, 0L, 0L)) == -1L) // trunc(-5/4), floor would be -2

    assume(DuckDbLive.available, "duckdb_jdbc jar not in the offline cache")
    def ddMean(vals: Seq[Long]): Long = DuckDbLive.withConnection("") { c =>
      DuckDbLive
        .queryRows(c,
          s"""SELECT ${graft.queries.SimQueries.meanBpSql("//")} AS m
             FROM (VALUES ${vals.map(v => s"(CAST($v AS BIGINT))").mkString(", ")})
               t(recall_bp)""")
        .map(_.head.asInstanceOf[Number].longValue)
    }.head
    assert(ddMean(Seq(-5L, 0L, 1L)) == -1L)
    assert(ddMean(Seq(5L, 0L, 1L)) == 2L)
    assert(ddMean(Seq(-5L, 0L, 0L, 0L)) == -1L)
  }
}
