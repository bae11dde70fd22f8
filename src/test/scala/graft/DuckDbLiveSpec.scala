package graft

import graft.pipeline.Features
import graft.sinks.{DuckDbLive, DuckDbSink}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

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

  test("widened type map + null cells: timestamp/date/decimal/blob/short/byte round-trip") {
    // the reference appender's FULL map (DatabaseWriter.cs:299-315) and
    // its AppendNull path (DatabaseWriter.cs:164): every column type the
    // DDL generator emits must survive the live appender, and a null in
    // ANY column must land as SQL NULL, not NPE
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b_big", LongType),
      StructField("c_int", IntegerType),
      StructField("d_small", ShortType),
      StructField("e_tiny", ByteType),
      StructField("f_real", FloatType),
      StructField("g_dbl", DoubleType),
      StructField("h_bool", BooleanType),
      StructField("i_str", StringType),
      StructField("j_ts", TimestampType),
      StructField("k_date", DateType),
      StructField("l_dec", DecimalType(18, 3)),
      StructField("m_blob", BinaryType)
    ))
    val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05.123456Z"))
    val ts3 = java.sql.Timestamp.from(java.time.Instant.parse("2024-06-07T08:09:10.000001Z"))
    val rows = Seq(
      org.apache.spark.sql.Row(
        1L, 7, 3.toShort, 2.toByte, 1.5f, 2.25, true, "alpha", ts1,
        java.sql.Date.valueOf("2024-03-05"), new java.math.BigDecimal("12.345"),
        Array[Byte](0x00, 0x7f, -1)),
      org.apache.spark.sql.Row(
        2L, null, null, null, null, null, null, null, null, null, null, null),
      org.apache.spark.sql.Row(
        3L, -3, (-3).toShort, (-2).toByte, -0.5f, 1e-3, false, "beta", ts3,
        java.sql.Date.valueOf("2023-12-31"), new java.math.BigDecimal("-0.001"),
        Array[Byte](-85, -51)) // 0xAB 0xCD
    )
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), schema)
    val db = java.nio.file.Files.createTempDirectory("graft_live_types_").toString + "/w.db"
    val (n, back) = DuckDbLive.withConnection(db) { c =>
      DuckDbLive.execute(c, DuckDbSink.ddlFor(schema, "W", useFloat32 = false))
      val n = DuckDbLive.appendAll(c, "W", df, commitEvery = 2)
      val row = DuckDbLive.queryRow(
        c,
        """SELECT count(*), count("c_int"), sum("c_int"), count("j_ts"),
          |strftime(min("j_ts"), '%Y-%m-%d %H:%M:%S.%f'),
          |min("k_date")::VARCHAR, sum("l_dec")::VARCHAR,
          |string_agg(hex("m_blob"), '|' ORDER BY "b_big"),
          |sum("d_small"), sum("e_tiny"), count("m_blob") FROM "W"""".stripMargin
      )
      (n, row)
    }
    assert(n == 3L)
    assert(back(0).asInstanceOf[Number].longValue == 3L)
    assert(back(1).asInstanceOf[Number].longValue == 2L, "null int must count as missing")
    assert(back(2).asInstanceOf[Number].longValue == 4L)
    assert(back(3).asInstanceOf[Number].longValue == 2L, "null timestamp must count as missing")
    assert(back(4).toString == "2024-01-02 03:04:05.123456", "UTC micros must survive")
    assert(back(5).toString == "2023-12-31")
    assert(back(6).toString == "12.344")
    assert(back(7).toString == "007FFF|ABCD", "blob bytes must survive the \\xHH cast path")
    assert(back(8).asInstanceOf[Number].longValue == 0L)
    assert(back(9).asInstanceOf[Number].longValue == 0L)
    assert(back(10).asInstanceOf[Number].longValue == 2L)
  }

  test("appendPartitioned: executor-side appenders write one DuckDB file per partition") {
    // the distributed form the class doc promises: per-partition appender
    // connections opened inside foreachPartition (not on the driver), one
    // single-writer DuckDB file each; the union of the files is the frame
    import org.apache.spark.sql.functions.col
    val df = spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2).repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("graft_live_part_").toString
    val files = DuckDbLive.appendPartitioned(df, dir, "P", commitEvery = 10)
    assert(files.size >= 2, s"expected multiple per-partition files, got $files")
    val (rows, idSum) = files.map { f =>
      val r = DuckDbLive.withConnection(s"$dir/$f")(c =>
        DuckDbLive.queryRow(c, """SELECT count(*), coalesce(sum("id"), 0) FROM "P""""))
      (r(0).asInstanceOf[Number].longValue, r(1).asInstanceOf[Number].longValue)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(rows == 100L, "union of per-partition files must hold every row exactly once")
    assert(idSum == 4950L)
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
