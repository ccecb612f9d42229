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
  /** The driver's `events.ts` is parquet TIMESTAMP(NANOS), which Spark only
    * reads as a nanosecond Long (`spark.sql.legacy.parquet.nanosAsLong=true`,
    * set in all our sessions) — convert to a microsecond timestamp, lossless
    * here (no sub-microsecond components) and identical to how DuckDB reads
    * the same file (TIMESTAMP, µs). Rewritten copies (ScaleUp rehearsal data)
    * already carry a true µs timestamp column — pass those through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
