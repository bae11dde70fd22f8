package graft.pipeline

import graft.model.FeaturesConfig
import graft.ops.{BarOps, FeatureOps, Folds}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship feature pipeline — the Spark-native re-expression of the
  * reference's per-bar dataflow (`OnBarUpdate` → `FeaturesBarService` →
  * `FeaturesBarCreator`, SURVEY.md §3.2):
  *
  *   events → day bars (O1/O2) → EMA9/EMA21 (O7) → trailing-21 feature
  *   windows (O5/O6) → 7 `F_*` features (O8-O13) → warm-up filter (O3) →
  *   14-column ordinal-sorted output (O20 schema discipline).
  *
  * One declarative plan: Catalyst prunes the parquet scan to the three used
  * columns, the groupBy and all window stages share a single hash exchange
  * lineage on user_id, and every feature expression is whole-stage
  * codegen'd except the two fold aggregates (higher-order functions).
  */
object Features {

  /** Bars + both EMAs. EMA is computed over the per-series bar stream from
    * partition start (capped fold frame), not day-reset — matching the
    * reference, whose EMA indicators are attached to the raw series
    * (`StrategyAnalyzerExporter.cs:138-139`, deviation note SURVEY.md
    * §2.4.3).
    */
  def barsWithEma(events: DataFrame, cfg: FeaturesConfig = FeaturesConfig()): DataFrame = {
    // Running EMA from partition start via the graft_ema_run aggregate —
    // O(1) state per row over an incremental running frame, no per-row
    // array materialization, and NT-faithful (the reference's EMA
    // indicators run over the whole loaded series with no lookback cap,
    // StrategyAnalyzerExporter.cs:138-139). Oracle mirror: unbounded
    // list(close) + list_reduce — bit-identical recurrence.
    val wRun = BarOps.wSeries.rowsBetween(Long.MinValue, 0)
    BarOps
      .dayBars(events)
      .withColumn("ema_fast", call_function("graft_ema_run", col("close"), lit(cfg.lookbackFast)).over(wRun))
      .withColumn("ema_slow", call_function("graft_ema_run", col("close"), lit(cfg.lookbackSlow)).over(wRun))
  }

  /** Full enriched frame: every bar column, both EMAs, all seven features,
    * and the warm-up row number. Downstream queries filter/project.
    */
  def enriched(events: DataFrame, cfg: FeaturesConfig = FeaturesConfig()): DataFrame = {
    val tol = cfg.tolerance
    val wb = BarOps.wBuf(cfg.barsRequiredToTrade)
    val lFast = collect_list(col("ema_fast")).over(wb)
    val lSlow = collect_list(col("ema_slow")).over(wb)
    barsWithEma(events, cfg)
      .withColumn("rn", row_number().over(BarOps.wSeries))
      .withColumn("f_clv", FeatureOps.clv(col("close"), col("high"), col("low"), tol))
      .withColumn("f_olv", FeatureOps.olv(col("open"), col("high"), col("low"), tol))
      .withColumn("f_ma_dist", FeatureOps.maDistance(col("close"), col("ema_fast"), tol))
      .withColumn("f_ma_dist_slow", FeatureOps.maDistance(col("close"), col("ema_slow"), tol))
      .withColumn(
        "f_ma_slope",
        FeatureOps.slopePct(
          first(col("ema_fast")).over(wb),
          col("ema_fast"),
          count(lit(1)).over(wb),
          tol
        )
      )
      .withColumn("f_ma_ac", Folds.autocorrLag1(lFast, tol))
      .withColumn("f_ma_ac_slow", Folds.autocorrLag1(lSlow, tol))
  }

  /** The `FeaturesBar` output in the reference's dynamic-schema column
    * order (ordinal sort of property names, `DatabaseWriter.cs:222-225`),
    * doubles rounded to 6 decimals for oracle parity. Warm-up: emit once
    * the per-series buffer holds ≥ barsRequiredToTrade rows
    * (`FeaturesBarService.cs:44`).
    */
  def featuresFull(
      events: DataFrame,
      cfg: FeaturesConfig = FeaturesConfig(),
      ordered: Boolean = true
  ): DataFrame = {
    def r6(c: String) = FeatureOps.r6(col(c))
    val out = enriched(events, cfg)
      .filter(col("rn") >= cfg.barsRequiredToTrade)
      .select(
        col("user_id"),
        col("close").as("Close"),
        col("day").as("Day"),
        r6("f_clv").as("F_CloseLocationValue"),
        r6("f_ma_ac").as("F_MovingAverageAutocorrelation"),
        r6("f_ma_dist").as("F_MovingAverageDistance"),
        r6("f_ma_slope").as("F_MovingAverageSlope"),
        r6("f_ma_ac_slow").as("F_MovingAverageSlowAutocorrelation"),
        r6("f_ma_dist_slow").as("F_MovingAverageSlowDistance"),
        r6("f_olv").as("F_OpenLocationValue"),
        col("high").as("High"),
        col("low").as("Low"),
        col("open").as("Open"),
        col("time").as("Time"),
        col("volume").cast("double").as("Volume")
      )
    // The sort exists for oracle determinism; sinks skip it (a global sort
    // before a write is a pure range-exchange tax — and the write path
    // executes the plan twice: once to sample range bounds, once to write).
    if (ordered) out.orderBy("user_id", "Day") else out
  }

  /** The exported FeaturesBar schema after the sink's float32 downcast —
    * the STATIC column contract (property list mirrors `FeaturesBar.cs:
    * 3-51`; integer codes stay BIGINT per `DatabaseWriter.cs:198-202`).
    * The s01 DDL oracle pins `DuckDbSink.ddlFor` of exactly this schema,
    * so a drift between the pipeline's output and the declared contract
    * surfaces as a hash mismatch, not silently.
    */
  val featuresF32Schema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(
      Seq(
        StructField("user_id", LongType),
        StructField("Close", FloatType),
        StructField("Day", LongType),
        StructField("F_CloseLocationValue", FloatType),
        StructField("F_MovingAverageAutocorrelation", FloatType),
        StructField("F_MovingAverageDistance", FloatType),
        StructField("F_MovingAverageSlope", FloatType),
        StructField("F_MovingAverageSlowAutocorrelation", FloatType),
        StructField("F_MovingAverageSlowDistance", FloatType),
        StructField("F_OpenLocationValue", FloatType),
        StructField("High", FloatType),
        StructField("Low", FloatType),
        StructField("Open", FloatType),
        StructField("Time", LongType),
        StructField("Volume", FloatType)
      )
    )
  }

  /** featuresFull with the reference sink's float32 downcast
    * (`DatabaseWriter.cs:198-202,310`, `UseFloat32=true` default — ~50%
    * storage, README.md:68). Integer codes stay BIGINT.
    */
  def featuresF32(events: DataFrame, cfg: FeaturesConfig = FeaturesConfig()): DataFrame = {
    val df = featuresFull(events, cfg)
    df.select(df.columns.map { c =>
      if (Set("user_id", "Day", "Time").contains(c)) col(c) else col(c).cast("float").as(c)
    }.toIndexedSeq: _*)
  }
}
