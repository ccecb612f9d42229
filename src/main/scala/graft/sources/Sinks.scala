package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Sink helpers (SURVEY.md §2a O13 generalized): the reference's only sink is
 * a driver-side results CSV; a real engine needs distributed, partitioned,
 * re-readable outputs. Parquet is the primary format (columnar, pushdown,
 * partition pruning); CSV/JSON exist for interchange.
 *
 * 100 TB notes: `partitionBy` lays out hive-style directories so downstream
 * readers prune partitions at planning time (verify `PartitionFilters` in the
 * scan — SinksSpec does); combined with per-partition file sizing
 * (`maxRecordsPerFile`) this is the standard lake layout. Writers are
 * idempotent via overwrite mode at the prefix level.
 */
object Sinks {

  /** Partitioned parquet: the lake layout. `partitionCols` become directory
    * levels; readers filtering on them scan only matching directories. */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Plain parquet (no partitioning). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Distributed CSV with header (the reference's results-CSV shape, but
    * written by executors, not the driver). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON lines. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC (the other columnar lake format, built into Spark): same pushdown /
    * pruning / partitionBy story as parquet for shops standardized on ORC.
    * `partitionCols` optional. */
  def writeOrc(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .orc(path)

  /** Bucketed + sorted managed table: rows are hash-partitioned into
    * `buckets` files by `bucketCol` at write time, so an equi-join of two
    * tables bucketed the same way needs NO shuffle at read time — the
    * co-located join layout for repeated fact-fact joins at scale
    * (SinksSpec asserts the exchange-free plan). Requires a catalog
    * (saveAsTable); bucket metadata lives in the metastore. */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction: rewrite a parquet prefix into ~`targetBytes`
    * files. The lake-maintenance pass every long-lived ingest needs — a
    * streaming sink or over-parallel job leaves thousands of KB-sized files,
    * and scan planning degrades with file count (driver-side listing +
    * footer reads, one task floor per file). Sizing reads from the files'
    * actual on-disk bytes, not row counts, so wide and narrow tables compact
    * to the same physical shape. Writes to `tmpPath` first, then re-points —
    * the source prefix is never half-rewritten.
    *
    * Returns (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, path: String, tmpPath: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String) =
      fs.globStatus(new org.apache.hadoop.fs.Path(p + "/*.parquet")).toSeq
    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmpPath)
    val afterN = parquetFiles(tmpPath).size
    // atomic-ish swap: remove source, move compacted output into place
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmpPath), new org.apache.hadoop.fs.Path(path))
    (before.size, afterN)
  }
}
