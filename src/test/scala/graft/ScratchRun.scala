package graft

import org.apache.spark.sql.SparkSession

/** Throwaway smoke runner for new queries (Test scope; not a suite). */
object ScratchRun {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "s24_transform_with_state"
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SCRATCH_PLAN")) {
      println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_SHOW")) {
      SparkEntry.queries(name)(spark, sf).show(100, truncate = false)
      spark.stop(); return
    }
    val rows = SparkEntry.queries(name)(spark, sf).collect()
    def canonical(v: Any): String = v match {
      case d: Double => if (d == 0.0) "0" else java.lang.Double.toString(d)
      case x => String.valueOf(x)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      md.update(r.toSeq.map(canonical).mkString("|").getBytes("UTF-8"))
      md.update('\n'.toByte)
    }
    println(s"GOLDEN $name ${rows.length}L ${md.digest().map("%02x".format(_)).mkString}")
    spark.stop()
  }
}
