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
    * gives the µs view both engines agree on). All graded sessions run
    * with spark.sql.session.timeZone=UTC, so the NTZ wall clock is the
    * UTC epoch DuckDB's `epoch_us` reports. See SURVEY.md §1.2.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→epoch cast below interprets the wall clock in the SESSION
    // timezone; the epoch-nanos contract is UTC. Graded harness sessions
    // already pin UTC, but this is a public entry point — pin it here too
    // so a caller's non-UTC session can't silently shift ts by its zone
    // offset (same single-chokepoint policy as nanosAsLong above).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df // nanos-as-long already
      case _ => // TIMESTAMP or TIMESTAMP_NTZ (µs) → epoch-nanos long
        df.withColumn("ts", (unix_micros(col("ts").cast("timestamp")) * 1000L).as("ts"))
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
