package graft

import graft.pipeline.Features
import graft.sinks.{DuckDbLive, DuckDbSink}
import org.scalatest.funsuite.AnyFunSuite

/** Live DuckDB appender binding (DatabaseWriter.cs:141-212 re-expressed
  * over the offline-cached public duckdb_jdbc driver): jar discovery,
  * DDL execution, native-appender round trip, commit cadence.
  */
class DuckDbLiveSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("duckdb_jdbc resolves from the offline artifact cache") {
    // Rounds 5-8 each disproved an "environment-blocked" premise (imageio,
    // sound.sampled, RIFF/AVI); this pins the round-8 one: the driver jar
    // IS reachable offline, so s01's live path must run, not fall back.
    assert(DuckDbLive.available, s"expected a duckdb_jdbc jar; found ${DuckDbLive.jarPath}")
  }

  test("DDL + native appender + JDBC read-back round-trips every scalar type") {
    val df = Seq(
      (1L, 7, 1.5f, 2.25, true, "alpha"),
      (2L, -3, -0.5f, 1e-3, false, "beta\"quoted"),
      (3L, 0, 3.75f, -4.5, true, "")
    ).toDF("IdBig", "IdInt", "ValF", "ValD", "Flag", "Tag")
    val ordered = df.select(
      DuckDbSink.ordinalColumns(df.schema).map(f => org.apache.spark.sql.functions.col(f.name)): _*
    )
    val db = java.nio.file.Files.createTempDirectory("graft_live_test_").toString + "/t.db"
    val (n, back) = DuckDbLive.withConnection(db) { c =>
      DuckDbLive.execute(c, DuckDbSink.ddlFor(df.schema, "T", useFloat32 = false))
      val n = DuckDbLive.appendAll(c, "T", ordered, commitEvery = 2)
      val row = DuckDbLive.queryRow(
        c,
        """SELECT count(*), sum("IdBig"), sum("IdInt"), sum("ValF"), sum("ValD"),
          |count(CASE WHEN "Flag" THEN 1 END),
          |string_agg("Tag", '|' ORDER BY "IdBig") FROM "T"""".stripMargin
      )
      (n, row)
    }
    assert(n == 3L)
    assert(back(0).asInstanceOf[Number].longValue == 3L)
    assert(back(1).asInstanceOf[Number].longValue == 6L)
    assert(back(2).asInstanceOf[Number].longValue == 4L)
    assert(math.abs(back(3).asInstanceOf[Number].doubleValue - 4.75) < 1e-6)
    assert(math.abs(back(4).asInstanceOf[Number].doubleValue - (2.25 + 1e-3 - 4.5)) < 1e-12)
    assert(back(5).asInstanceOf[Number].longValue == 2L)
    assert(back(6).toString == "alpha|beta\"quoted|")
  }

  test("featuresF32Schema matches the pipeline's real f32 export schema") {
    // the s01 DDL oracle is generated from the STATIC schema; this pins it
    // to the actual pipeline output so they cannot drift apart
    val real = Features.featuresF32(graft.ops.Tables.events(spark, "/root/testdata/sf0.001")).schema
    val declared = Features.featuresF32Schema
    assert(
      real.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq ==
        declared.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    )
  }
}
