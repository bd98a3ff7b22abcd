package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory is assembled from the per-layer modules; each Q carries
  * its own DuckDB oracle SQL (or None for non-SQL-expressible operators,
  * which the driver downgrades to a rows-only check).
  */
object SparkEntry {

  def specs: Seq[Q] =
    Relational.all ++ ScalarFuncs.all ++ TextOps.all ++ Html.all ++
      Urls.all ++ Similarity.all ++ Pq.all ++ MinHash.all ++ Dedup.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qJoinTopk.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
