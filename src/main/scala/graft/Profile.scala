package graft

import org.apache.spark.sql.SparkSession

/** Micro-profiler: times labeled stages of hot queries to localize cost.
  * Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    import graft.ops.Tables
    import graft.pipeline.Features
    // warm-up
    Tables.events(spark, sfDir).count()
    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] documents partitions = ${docs.rdd.getNumPartitions}")
    println(s"[profile] events partitions = ${Tables.events(spark, sfDir).rdd.getNumPartitions}")

    t("featuresFull count")(Features.featuresFull(Tables.events(spark, sfDir)).count())
    t("featuresFull noop-write") {
      Features.featuresFull(Tables.events(spark, sfDir)).write.format("noop").mode("overwrite").save()
    }
    val out = java.nio.file.Files.createTempDirectory("graft_prof_").toString
    t("featuresFull parquet write (sorted)") {
      Features.featuresFull(Tables.events(spark, sfDir)).write.mode("overwrite").parquet(out)
    }
    t("sink.write (ordinal+f32)") {
      graft.sinks.DuckDbSink.write(Features.featuresFull(Tables.events(spark, sfDir)), "T", out)
    }
    t("q34 full")(SparkEntry.queries("q34_minhash_pairs")(spark, sfDir).count())
    t("q33 forced (noop)")(
      SparkEntry.queries("q33_minhash_lsh")(spark, sfDir).write.format("noop").mode("overwrite").save()
    )
    // q60 decomposition: shingle explode alone vs + count-agg vs full
    import org.apache.spark.sql.functions._
    t("q60 explode only (noop)") {
      docs
        .repartition(col("doc_id"))
        .select(explode(graft.ops.Hashing.shingles(split(col("text"), " "), 3)).as("gram"))
        .write.format("noop").mode("overwrite").save()
    }
    t("q60 explode+agg (noop)") {
      docs
        .repartition(col("doc_id"))
        .select(explode(graft.ops.Hashing.shingles(split(col("text"), " "), 3)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    t("q60 full")(SparkEntry.queries("q60_ngram_topk")(spark, sfDir).count())
    t("q60 no-repartition explode (noop)") {
      docs
        .select(explode(graft.ops.Hashing.shingles(split(col("text"), " "), 3)).as("gram"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
