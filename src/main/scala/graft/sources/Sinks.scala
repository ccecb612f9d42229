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

  /** Z-ORDERED parquet: cluster rows along an N-D Morton curve so file (and
    * row-group) min/max stats prune on EVERY z-ordered column — the
    * lakehouse layout for multi-column range/point lookups without
    * duplicating the table (a single-column sort leaves every file spanning
    * the full range of the other columns). Same N-column surface as
    * Delta/Iceberg's OPTIMIZE ZORDER.
    *
    * Mechanics, all distributed:
    *  1. per column: `approx_percentile` over 2^bits evenly-spaced quantiles
    *     → broadcastable cut arrays (ONE pass, mergeable sketch — never a
    *     global sort-rank of the data);
    *  2. bucket id = #cuts below the value (codegen'd fold over the tiny
    *     broadcast array) — quantile bucketing makes the curve skew-immune:
    *     equal-population tiles, whatever the value distribution;
    *  3. Morton-interleave the bucket ids ([[graft.functions.ZOrder]],
    *     codegen'd; 64/n bits per column) and range-partition + sort by the
    *     z-value into `files` output files — each file covers a compact
    *     N-D tile.
    *
    * NULLs sort first: a null key buckets to 0 (callers wanting nulls
    * isolated should filter or fill first). */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int, bits: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order takes 2..8 columns, got ${cols.size}")
    // bits is capped at 12: the bucketing fold embeds the 2^bits-1 cut array
    // as a literal evaluated per row per column, so 4095 cuts is already the
    // practical ceiling (beyond it the folded literal dominates the write);
    // past 2 columns the interleave holds only 63/n bits per column — 63,
    // not 64, because a 64-bit code can set the SIGN bit, and both the
    // arithmetic shiftright deriving the tile id and the range/sort on the
    // code are signed: half the rows would order 2^63.. before 0.., making
    // the sign-straddling file a union of opposite corners of the space
    // (pruning silently erased — the r15 review's 8x8 finding).
    val maxBits = math.min(12, 63 / cols.size)
    require(bits >= 1 && bits <= maxBits,
      s"bits must be in [1, $maxBits] for ${cols.size} columns, got $bits")
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val cuts = df.agg(
      percentile_approx(col(cols.head).cast("double"), typedLit(probs), lit(10000)),
      cols.tail.map(c =>
        percentile_approx(col(c).cast("double"), typedLit(probs), lit(10000))): _*).head
    cols.zipWithIndex.foreach { case (c, i) =>
      require(!cuts.isNullAt(i),
        s"cannot Z-order $path: percentile_approx returned null for $c " +
          "(empty input or all-null column)")
    }
    def bucket(c: String, cutsArr: Seq[Double]) =
      aggregate(typedLit(cutsArr), lit(0L),
        (acc, cut) => acc + when(col(c).cast("double") >= cut, 1L).otherwise(0L))
    val z = graft.functions.ZOrder.interleaveBitsN(
      cols.zipWithIndex.map { case (c, i) => bucket(c, cuts.getSeq[Double](i)) })
    // File assignment ranges over the TILE id (the code's top ceil(log2
    // files) bits), not the raw code: repartitionByRange picks boundaries by
    // SAMPLING, and a boundary landing mid-tile makes the two adjacent files
    // both span that tile's parent box — enough slop to erase the whole
    // pruning win on the curve's 4th-level axis (measured: a z-band touched
    // 15/16 files instead of 4). Quantile bucketing makes tiles
    // equal-population, so whole-tile range assignment keeps files balanced
    // while every file's min/max box stays a union of complete tiles.
    val codeBits = cols.size * bits
    val tileBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(files - 1, 1).toLong)
    // codeBits tops out at 63 (sign bit never set — see maxBits above);
    // files is an Int, so any codeBits >= 31 addresses more tiles than
    // `files` can express — only check the small-codeBits case.
    require(codeBits >= 31 || files <= (1L << codeBits),
      s"files=$files exceeds the ${1L << codeBits} addressable tiles at " +
        s"${cols.size} columns x $bits bits")
    val shift = math.max(codeBits - tileBits.toInt, 0)
    require(!df.columns.contains("__z") && !df.columns.contains("__tile"),
      "writeZOrdered uses __z/__tile as scratch columns; the input frame " +
        "already has one (it would be silently dropped from the output) — " +
        "rename it first")
    df.withColumn("__z", z)
      .withColumn("__tile", shiftright(col("__z"), shift))
      .repartitionByRange(files, col("__tile"))
      .sortWithinPartitions("__z")
      .drop("__z", "__tile")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Two-column convenience form (the historical signature). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int, bits: Int = 8): Unit =
    writeZOrdered(df, path, Seq(colA, colB), files, bits)

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

  /** UPSERT-BY-PARTITION into a hive-layout prefix: overwrite ONLY the
    * partition directories present in `updates`, leave every other leaf
    * byte-untouched (Spark's dynamic partition overwrite, pinned here per
    * write instead of session-wide). This is the merge-on-rewrite pattern a
    * partitioned 100 TB lake uses for late/corrected data: the day's
    * partition is replaced atomically per leaf; untouched history never
    * rewrites, so cost scales with the UPDATE's partitions, not the table.
    * Readers see old-or-new per leaf (per-leaf swap), never a half-written
    * mix inside one. Spec proves untouched-leaf file identity (same names,
    * same bytes) and replaced-leaf content. */
  def overwritePartitions(updates: DataFrame, path: String, partitionCols: String*): Unit =
    updates.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  private def fsFor(spark: SparkSession, path: String) =
    // Path.getFileSystem, not FileSystem.get(new URI(..)): a legal Hadoop
    // path with URI-illegal characters (spaces) crashes the URI constructor
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The aside name for a prefix mid-swap: HIDDEN (dot-prefixed, in the
    * same parent) so a partitioned reader's discovery over the lake root
    * never sees it as a bogus partition value — previously
    * `<leaf>.compact-old` sat beside real `k=v` directories and a scan in
    * the swap window inferred a string partition "v.compact-old" (silently
    * wrong types/rows) instead of the documented clean failure. */
  private def asideFor(path: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(path.getParent,
      "." + path.getName + ".compact-old")

  /** A crashed prior compaction can leave the data only at
    * `<path>.compact-old` (crash between the two swap renames). Detect the
    * orphan and restore it so a rerun self-heals instead of failing the
    * "prefix is empty" precondition and demanding manual recovery. */
  private def restoreOrphanedAside(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val aside = asideFor(fs.makeQualified(p))
    if (!fs.exists(p) && fs.exists(aside)) {
      System.err.println(s"[graft.sinks] $path missing but $aside exists " +
        "(prior compaction crashed mid-swap); restoring the original data")
      require(fs.rename(aside, p), s"could not restore $path from $aside")
    }
  }

  /** Small-file compaction: rewrite a parquet prefix into ~`targetBytes`
    * files. The lake-maintenance pass every long-lived ingest needs — a
    * streaming sink or over-parallel job leaves thousands of KB-sized files,
    * and scan planning degrades with file count (driver-side listing +
    * footer reads, one task floor per file). Sizing reads from the files'
    * actual on-disk bytes, not row counts, so wide and narrow tables compact
    * to the same physical shape. Writes to `tmpPath` first, then re-points —
    * the source prefix is never half-rewritten.
    *
    * Swap visibility contract: the swap is two renames, and between them the
    * canonical prefix briefly does not exist — run compaction as an offline
    * maintenance pass; a reader planning a scan in that window fails cleanly
    * and retries. A crash inside the window leaves the original data intact
    * at `<path>.compact-old`, and the next run restores it automatically
    * (see `restoreOrphanedAside`). `tmpPath` must be on the same FileSystem
    * as `path` (rename cannot cross filesystems) — validated up front.
    *
    * Returns (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, path: String, tmpPath: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = fsFor(spark, path)
    val tmpFs = fsFor(spark, tmpPath)
    require(fs.getUri == tmpFs.getUri,
      s"tmpPath must live on the same FileSystem as path for the atomic-rename " +
        s"swap: ${tmpFs.getUri} vs ${fs.getUri}")
    restoreOrphanedAside(fs, path)
    def parquetFiles(p: String) =
      Option(fs.globStatus(new Path(p + "/*.parquet"))).map(_.toSeq).getOrElse(Seq.empty)
    val before = parquetFiles(path)
    // a hive-partitioned prefix keeps its files one directory level down —
    // compacting it flat would fold partition columns back into the data and
    // destroy pruning; use compactPartitionedParquet for those layouts
    require(before.nonEmpty,
      s"$path has no top-level parquet files (missing, empty, or hive-partitioned " +
        "prefix — use compactPartitionedParquet for partitioned layouts)")
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // coalesce, not repartition, when SHRINKING (the normal compaction
    // direction): it merges whole input files with no shuffle, so any
    // clustering the prefix carries (a writeZOrdered layout, a sorted
    // ingest) survives as unions of a few complete input boxes —
    // repartition's round-robin would spread every file across the full
    // range of every column and silently erase min/max pruning
    val src = spark.read.parquet(path)
    writeParquet(if (nOut < before.size) src.coalesce(nOut) else src.repartition(nOut), tmpPath)
    val afterN = parquetFiles(tmpPath).size
    // crash-safe swap: the data exists at BOTH paths until the compacted
    // files are in place; only then does the old prefix go. Every rename is
    // checked — a false result can never strand the canonical path empty.
    val aside = asideFor(fs.makeQualified(new Path(path)))
    fs.delete(aside, true) // clear debris from a prior crashed run
    require(fs.rename(new Path(path), aside), s"could not move $path aside")
    if (!fs.rename(new Path(tmpPath), new Path(path))) {
      // roll back — and CHECK it: an unchecked false here would report
      // "rolled back" while the canonical path sits empty and the data
      // lives only at the aside (recoverable, but the operator must know)
      if (fs.rename(aside, new Path(path)))
        sys.error(s"could not move $tmpPath into place (rolled back; $path intact)")
      else
        sys.error(s"could not move $tmpPath into place AND the rollback rename " +
          s"failed: $path is currently MISSING and the original data is intact at " +
          s"$aside — restore it manually or rerun (restoreOrphanedAside self-heals)")
    }
    fs.delete(aside, true)
    (before.size, afterN)
  }

  /** Per-partition-directory compaction for hive-partitioned prefixes — the
    * layout streaming sinks actually produce (date-partitioned, thousands of
    * tiny files per day). Walks the prefix, finds every leaf directory that
    * directly holds parquet files (`k1=v1/k2=v2/part-*.parquet`), and runs
    * `compactParquet` on each leaf in place. Partition values stay encoded in
    * the directory names, so pruning survives untouched, and each leaf swap
    * is independently crash-safe: a crash mid-sweep leaves every other
    * partition intact and the next run self-heals the one mid-swap.
    *
    * 100 TB notes: the per-leaf rewrite is a distributed Spark job; the sweep
    * over leaves is driver-side sequential by design — compaction is
    * IO-bound maintenance, and serializing leaves bounds cluster-wide write
    * amplification to one partition's worth at a time.
    *
    * Streaming-sink prefixes: a structured-streaming parquet sink keeps a
    * `_spark_metadata` transaction log at the root that pins the exact
    * pre-compaction file set — readers honoring it would miss every
    * compacted file, and deleting it out from under a STILL-LIVE sink
    * destroys the sink's exactly-once commit log (readers could then observe
    * uncommitted files). Compaction therefore REFUSES a prefix carrying the
    * log unless the caller passes `finalizeStreamingSink = true`, which
    * asserts the sink is retired; only then is the log deleted (loudly) and
    * the prefix reverted to plain directory-listing semantics.
    *
    * Returns (filesBefore, filesAfter) summed over all leaves. */
  def compactPartitionedParquet(spark: SparkSession, path: String, tmpPath: String,
                                targetBytes: Long = 128L * 1024 * 1024,
                                finalizeStreamingSink: Boolean = false): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = fsFor(spark, path)
    // validate EVERYTHING destructive-order-first: the sink-log deletion
    // below is irreversible, so the same-filesystem precondition (otherwise
    // first checked deep inside the per-leaf swap) and the
    // prefix-actually-compactable checks must pass BEFORE it — a bad
    // tmpPath must fail with the log (and the exactly-once semantics it
    // carries) untouched
    require(fs.getUri == fsFor(spark, tmpPath).getUri,
      s"tmpPath must live on the same FileSystem as path for the atomic-rename " +
        s"swap: ${fsFor(spark, tmpPath).getUri} vs ${fs.getUri}")
    val root = fs.makeQualified(new Path(path))
    require(fs.exists(root), s"$path does not exist")
    val sinkLog = new Path(root, "_spark_metadata")
    val hadSinkLog = fs.exists(sinkLog)
    if (hadSinkLog) {
      require(finalizeStreamingSink,
        s"$path carries a streaming-sink _spark_metadata log; compacting would " +
          "destroy the sink's exactly-once commit log. If the sink is retired, " +
          "pass finalizeStreamingSink = true to finalize the prefix to " +
          "plain-listing semantics; never compact a live sink")
      // Reconcile BEFORE dropping the log: a crashed final micro-batch can
      // leave part-files on disk that the log never committed — readers
      // honoring the log do not see them, and deleting the log wholesale
      // would silently legitimize them as data. Read the committed file set
      // from the FileStreamSinkLog DIRECTLY (ADVICE r15: the first version
      // scanned the whole DATASET and collected input_file_name() — an
      // O(dataset) read for a metadata question, and a committed zero-row
      // part-file yields no rows, so it was misclassified and deleted as an
      // orphan, contradicting the log message). The log read is O(log),
      // and zero-row committed files are committed.
      val committed = {
        import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
        new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, sinkLog.toString)
          .allFiles()
          .map(f => new Path(new java.net.URI(f.path)).toUri.getPath).toSet
      }
      val onDisk = {
        def walk(d: Path): Seq[Path] = {
          val st = fs.listStatus(d).toSeq
          st.filter(x => x.isFile && x.getPath.getName.endsWith(".parquet")).map(_.getPath) ++
            st.filter(x => x.isDirectory &&
                !x.getPath.getName.startsWith(".") && !x.getPath.getName.startsWith("_"))
              .flatMap(x => walk(x.getPath))
        }
        walk(root)
      }
      val orphans = onDisk.filterNot(f => committed.contains(f.toUri.getPath))
      orphans.foreach { f =>
        System.err.println(s"[graft.sinks] $path: deleting UNCOMMITTED part-file " +
          s"$f (on disk but absent from the sink's commit log — a crashed batch's " +
          "leftovers; keeping it would silently add uncommitted rows)")
        fs.delete(f, false)
      }
      System.err.println(s"[graft.sinks] $path: finalizeStreamingSink=true — " +
        s"deleting the streaming-sink _spark_metadata log (${orphans.size} orphan " +
        "file(s) removed; prefix reverts to plain-listing semantics)")
      fs.delete(sinkLog, true)
    }
    def leaves(p: Path): Seq[Path] = {
      // Self-heal FIRST: a leaf crashed between the two swap renames exists
      // only as `X.compact-old` — its base `X` is gone, so a plain walk would
      // silently skip that partition's data. Restore every such orphan before
      // classifying this level's entries.
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".") &&
          s.getPath.getName.endsWith(".compact-old"))
        .foreach { s =>
          val base = new Path(p,
            s.getPath.getName.stripPrefix(".").stripSuffix(".compact-old"))
          restoreOrphanedAside(fs, base.toString)
        }
      // LEGACY asides (ADVICE r15): a pre-dot-prefix compaction crash left
      // an UN-DOTTED `X.compact-old` — it fails the hidden-aside restore
      // above yet passes the subdir filter below, so an unhandled one would
      // be compacted as a real partition directory and readers would see a
      // bogus partition value (e.g. o_year='5.compact-old'). Base missing →
      // it IS the data: restore it. Base present → ambiguous across the
      // writer upgrade (post-swap debris vs something else entirely) —
      // refuse loudly and let the operator adjudicate.
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
          s.getPath.getName.endsWith(".compact-old"))
        .foreach { s =>
          val base = new Path(p, s.getPath.getName.stripSuffix(".compact-old"))
          if (!fs.exists(base)) {
            System.err.println(s"[graft.sinks] ${base} missing but legacy aside " +
              s"${s.getPath} exists (pre-upgrade compaction crashed mid-swap); " +
              "restoring the original data")
            require(fs.rename(s.getPath, base),
              s"could not restore $base from legacy aside ${s.getPath}")
          } else sys.error(
            s"legacy aside ${s.getPath} exists alongside $base — refusing to " +
              s"compact: if the pre-upgrade swap completed ($base holds the " +
              "compacted data), delete the aside; otherwise restore it manually")
        }
      val st = fs.listStatus(p).toSeq
      val hasParquet = st.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      // Spark's hidden-path convention is BOTH '.'- and '_'-prefixes: a
      // crashed non-compaction write's _temporary debris must be neither
      // compacted (uncommitted data) nor allowed to trip the mixed-layout
      // guard (it sits beside real partition dirs and every reader ignores it)
      val subdirs = st.filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      // A directory holding both parquet files and partition subdirectories is
      // not a valid hive layout; compacting the ancestor would rename the whole
      // subtree aside and destroy descendant partitions. Refuse loudly.
      require(!(hasParquet && subdirs.nonEmpty),
        s"$p holds both parquet files and subdirectories (${subdirs.map(_.getPath.getName).mkString(", ")}) — " +
          "mixed layouts are not compactable; fix the layout before compacting")
      (if (hasParquet) Seq(p) else Seq.empty) ++ subdirs.flatMap(s => leaves(s.getPath))
    }
    val ls = leaves(root)
    require(ls.nonEmpty, s"$path holds no parquet files at any depth")
    val tmpRoot = fs.makeQualified(new Path(tmpPath))
    var (b, a) = (0, 0)
    ls.foreach { leaf =>
      val rel = leaf.toString.stripPrefix(root.toString).stripPrefix("/")
      val leafTmp = if (rel.isEmpty) tmpRoot.toString else s"$tmpRoot/$rel"
      val (lb, la) = compactParquet(spark, leaf.toString, leafTmp, targetBytes)
      b += lb; a += la
    }
    fs.delete(tmpRoot, true) // leaf swaps consumed their tmp dirs; drop the skeleton
    (b, a)
  }
}
