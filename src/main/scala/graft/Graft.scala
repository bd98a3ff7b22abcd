package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry points: a session factory with the configs this engine
  * relies on, table registration for the SQL surface, and the query
  * catalog. A user of the reference switches by building (or reusing) a
  * session and calling the operators, or registering the tables and
  * writing SQL.
  */
object Graft {

  /** Recommended session. `shufflePartitions` should track cluster
    * parallelism (set to 2–3× total executor cores in production; AQE
    * coalesces the excess at runtime).
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    functions.VectorFunctions.register(s)
    s
  }

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view (plus `fvec_dot`), making the
    * whole engine reachable from `spark.sql`.
    */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    functions.VectorFunctions.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    TableNames.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** The graded operator catalog (name → query). */
  def catalog: Map[String, (SparkSession, String) => DataFrame] = SparkEntry.queries
}
