package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated parquet star schema
  * (TESTDATA.md, FIXTURES.md). All query functions receive the
  * scale-factor directory at call time — never hardcode one.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has shipped with two `ts` physical types across
    * testdata generations: TIMESTAMP(NANOS) (rounds 1–9; Spark 4.1.2
    * refuses it without the legacy nanosAsLong config) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 10+; Spark reads it
    * as TIMESTAMP_NTZ). Every reader of `events` goes through here and
    * gets the same contract regardless of generation: `ts` is a LongType
    * of epoch-NANOSECONDS (DuckDB parity: `epoch_ns(ts)`; `tsUs` below
    * gives the µs view both engines agree on). The NTZ→epoch cast is
    * session-timezone-FREE (wall-clock `timestampdiff` vs the NTZ epoch
    * literal — round 13; earlier rounds pinned the session tz to UTC
    * here, a session-wide side effect of a read). The one remaining
    * session conf this loader sets is `legacy.parquet.nanosAsLong`, the
    * only way Spark 4.1.2 reads the rounds-1–9 NANOS physical type at
    * all. See SURVEY.md §1.2.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df // nanos-as-long already
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall clock → UTC epoch via pure wall-clock arithmetic
        // (µs since the NTZ epoch literal) — NO session-timezone
        // dependency, so this read never mutates (or reads) the caller's
        // spark.sql.session.timeZone. A session-tz cast here would shift
        // ts by the caller's zone offset; timestampdiff over two NTZ
        // values is zone-free by construction.
        df.withColumn("ts",
          (expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            * 1000L).as("ts"))
      case _ => // TIMESTAMP (an instant): unix_micros is zone-free
        df.withColumn("ts", (unix_micros(col("ts")) * 1000L).as("ts"))
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Engine-identical float truncation (SURVEY.md §7.4: Spark round is
    * HALF_UP, DuckDB HALF_EVEN — floor-truncation matches bit-for-bit).
    * Mirror in oracle SQL as `floor(x*10^d)/10^d`.
    */
  def trunc(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f) / f
  }
  def trunc2(c: Column): Column = trunc(c, 2)
  def trunc4(c: Column): Column = trunc(c, 4)
  def trunc6(c: Column): Column = trunc(c, 6)

  /** For aggregates of fixed-decimal source data (money with 2 decimals,
    * price*discount products with 4): the exact sum lies ON the decimal
    * grid, so floor-truncation sits at a knife-edge where cross-engine ulp
    * noise flips the output. round() is the grid-safe choice there (the
    * noisy double rounds back to the grid point on both engines); floor is
    * the safe choice for off-grid irrationals (sqrt/ln). Verified against
    * DuckDB 1.0.0 at sf0.01.
    */
  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)

  /** Event time at microsecond granularity. DuckDB 1.0.0 truncates the
    * parquet TIMESTAMP(NANOS) column to a microsecond TIMESTAMP on read,
    * while Spark (with nanosAsLong) keeps full nanos — so every graded
    * comparison or output of `events.ts` must go through this (Spark
    * `ts div 1000` ≡ DuckDB `epoch_us(ts)`).
    */
  def tsUs: Column = expr("ts div 1000")
}
