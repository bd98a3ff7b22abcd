package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator: a Spark query plus (when SQL-expressible) its
  * DuckDB-1.0.0 oracle over the same parquet tables. Queries with no
  * oracle get the driver's weaker rows-only check and are covered by
  * ScalaTest properties instead (SURVEY.md §7.4 rule 7).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
