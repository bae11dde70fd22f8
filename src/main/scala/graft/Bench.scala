package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JIT, codegen, parquet reader+writer, shuffle and
    // window exec paths — so per-query timings measure the queries, not
    // one-time JVM initialization landing on whichever query runs first.
    locally {
      val warm = SparkEntry.queries
      Seq("q01_scan_project", "q04_bar_aggregate", "q13_window_minmax").foreach { n =>
        warm.get(n).foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => })
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft_warm_").toString
      try spark.range(8).toDF("i").write.mode("overwrite").parquet(tmp)
      catch { case _: Throwable => }
    }
    // noop sink, not count(): count() lets Catalyst prune every projected
    // column, so compute-heavy projections would be timed as near-zero.
    // The noop write executes the full plan and materializes every row.
    // Optional filter for isolated measurement: runMain graft.Bench q36 q18
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
      .map { case (name, fn) =>
        System.gc() // drain garbage from the previous query off this one's clock
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
        // a failed query must read as a failure, not as a fast run
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures carry -1 per query; keep them out of the suite total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
