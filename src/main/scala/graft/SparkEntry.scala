package graft
import graft.model.FeaturesConfig
import graft.ops.Tables
import graft.pipeline.Features
import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared in graft.queries.* (one file per capability
  * family); this object just flattens the registry into the driver's
  * shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full FeaturesBar pipeline (SURVEY.md §7.2): events → day bars →
    * EMA9/21 folds → 7 features → warm-up filter → 14-column reference
    * schema.
    */
  def entry(spark: SparkSession): DataFrame =
    Features.featuresFull(
      Tables.events(spark, "/root/testdata/sf0.001"),
      FeaturesConfig()
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
