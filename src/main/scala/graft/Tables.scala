package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the test-data star schema (TESTDATA.md).
  *
  * All tables are single parquet files per scale-factor directory; schemas
  * are fixed (FIXTURES.md) and carried by the parquet footers
  * (schema-on-read). At cluster scale these would be directories of many
  * files / partitions — `spark.read.parquet(dir)` handles both shapes
  * unchanged, so nothing here is local-mode-specific.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts is parquet INT64 TIMESTAMP(NANOS, isAdjustedToUTC=false),
    * which Spark 4 refuses to read as a timestamp (PARQUET_TYPE_ILLEGAL).
    * Read it as a nanos BIGINT (legacy conf, runtime-settable) and convert
    * to the µs TIMESTAMP_NTZ DuckDB sees (`ts div 1000` is exact — the
    * generator is µs-precision; plain `/` would go through double and lose
    * precision above 2^53).
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = eventsRaw(spark, sfDir)
    // ts layout depends on the writer: TIMESTAMP(NANOS) parquet arrives as
    // a nanos BIGINT (via the legacy conf), µs-timestamp parquet arrives
    // as a timestamp type already — normalize either to µs TIMESTAMP_NTZ.
    val tsExpr = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.select(raw.columns.map {
      case "ts" => tsExpr.as("ts")
      case c    => col(c)
    }.toIndexedSeq: _*)
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
