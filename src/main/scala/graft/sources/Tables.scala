package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Loaders for the driver-provided parquet tables (see /root/repo/TESTDATA.md,
 * FIXTURES.md). One method per table; all take the scale-factor directory.
 *
 * Scale notes: these are plain parquet scans — Catalyst pushes filters and
 * prunes columns into the scan (verify with `.explain("formatted")`:
 * `PushedFilters` / `ReadSchema`). At 100 TB the same code path applies;
 * partition pruning would additionally kick in if the data were laid out
 * with hive-style partitions.
 */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** The driver's `events.ts` has shipped as parquet TIMESTAMP(NANOS)
    * (which Spark only reads as a nanosecond Long —
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in all our sessions)
    * and, since round 9, as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read
    * as TIMESTAMP_NTZ). Normalize both to a microsecond TIMESTAMP (ltz):
    * the nanos->µs div is lossless here (no sub-µs components) and the
    * ntz->ltz cast is instant-preserving under the UTC session TZ — in
    * every case the same instants DuckDB reads from the same file.
    * Rewritten copies (ScaleUp rehearsal data) already carry a true µs ltz
    * column — pass those through. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))

  /** Normalize whatever flavor `ts` arrived in (see [[events]]) to a
    * microsecond TIMESTAMP (ltz). Shared with the streaming source, which
    * reads the same files. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
