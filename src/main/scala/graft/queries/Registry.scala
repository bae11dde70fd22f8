package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark program plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against
  * (SURVEY.md §2.3; driver contract in SparkEntry).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  /** All declared queries, assembled by SparkEntry. */
  def all: Seq[Q] =
    BarQueries.all ++ RelQueries.all ++ DedupQueries.all ++
      SimQueries.all ++ TextQueries.all ++ MediaQueries.all ++ StreamDemos.all
}
