package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sinks + re-read: partition pruning reaches the plan, values round-trip
  * across parquet/CSV/JSON. */
class SinksSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sinks").toString

  test("events.ts always normalizes to a microsecond ltz TIMESTAMP") {
    // the driver's testdata has shipped ts as nanos-as-long, naive micros
    // (ntz) and ltz across rounds; every flavor must surface as TIMESTAMP
    // (ltz) or unix_micros-based queries fail analysis (r09 regression)
    assert(Tables.events(spark, sf()).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // and the streaming source agrees with the batch loader
    assert(graft.streaming.Streams.eventStream(spark, sf()).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("compaction: many small files -> sized files, identical data, source swapped") {
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_partkey", "l_quantity")
    val expected = li.count()
    // simulate an over-parallel ingest: 40 tiny files
    li.repartition(40).write.parquet(s"$tmp/li_small")
    val (nBefore, nAfter) = Sinks.compactParquet(
      spark, s"$tmp/li_small", s"$tmp/li_small.compact", targetBytes = 256L * 1024)
    assert(nBefore === 40)
    assert(nAfter < nBefore, s"$nAfter !< $nBefore")
    val back = spark.read.parquet(s"$tmp/li_small")
    assert(back.count() === expected)
    assert(back.agg(sum("l_quantity")).head.getDouble(0) ===
      li.agg(sum("l_quantity")).head.getDouble(0))
    // tmp path fully swapped away
    assert(!new java.io.File(s"$tmp/li_small.compact").exists())
  }

  test("partitioned compaction: per-leaf file counts drop, data identical, pruning intact") {
    val orders = Tables.orders(spark, sf())
      .withColumn("o_year", year(col("o_orderdate")))
    // over-parallel partitioned ingest: up to 8 files in every o_year= leaf
    orders.repartition(8).write.partitionBy("o_year").parquet(s"$tmp/orders_psmall")
    val (nBefore, nAfter) = Sinks.compactPartitionedParquet(
      spark, s"$tmp/orders_psmall", s"$tmp/orders_psmall.compact",
      targetBytes = 64L * 1024 * 1024)
    assert(nAfter < nBefore, s"$nAfter !< $nBefore")
    val back = spark.read.parquet(s"$tmp/orders_psmall")
    assert(back.count() === orders.count())
    // exact (integer) sum identity — float sums vary with partition order
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ===
      orders.agg(sum("o_orderkey")).head.getLong(0))
    // hive layout survived: partition pruning still reaches the scan
    val y = new java.io.File(s"$tmp/orders_psmall").listFiles()
      .filter(_.isDirectory).map(_.getName).find(_.startsWith("o_year="))
      .get.stripPrefix("o_year=").toInt
    val pruned = back.where(col("o_year") === y)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    assert(pruned.count() === orders.where(col("o_year") === y).count())
    assert(!new java.io.File(s"$tmp/orders_psmall.compact").exists())
  }

  test("compaction self-heals an orphaned .compact-old from a crashed swap") {
    import org.apache.hadoop.fs.Path
    val df = Tables.nation(spark, sf())
    df.repartition(4).write.parquet(s"$tmp/nat_c")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"$tmp/nat_c"), spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two swap renames: data only at the
    // HIDDEN aside (dot-prefixed so lake-root partition discovery never
    // sees it as a bogus partition — the r15 review naming)
    assert(fs.rename(new Path(s"$tmp/nat_c"), new Path(s"$tmp/.nat_c.compact-old")))
    val (nBefore, _) = Sinks.compactParquet(
      spark, s"$tmp/nat_c", s"$tmp/nat_c.tmp", targetBytes = 64L * 1024 * 1024)
    assert(nBefore === 4) // restored aside was compacted, not rejected
    assert(spark.read.parquet(s"$tmp/nat_c").count() === df.count())
    assert(!fs.exists(new Path(s"$tmp/.nat_c.compact-old")))
  }

  test("partitioned compaction self-heals a leaf crashed between the swap renames") {
    import org.apache.hadoop.fs.Path
    val orders = Tables.orders(spark, sf())
      .withColumn("o_year", year(col("o_orderdate")))
    orders.repartition(4).write.partitionBy("o_year").parquet(s"$tmp/orders_crash")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two swap renames on ONE leaf: its data
    // exists only at <leaf>.compact-old, the base leaf directory is gone
    val leafName = new java.io.File(s"$tmp/orders_crash").listFiles()
      .filter(_.isDirectory).map(_.getName).find(_.startsWith("o_year=")).get
    val leaf = new Path(s"$tmp/orders_crash/$leafName")
    assert(fs.rename(leaf, new Path(s"$tmp/orders_crash/.$leafName.compact-old")))
    val (nBefore, nAfter) = Sinks.compactPartitionedParquet(
      spark, s"$tmp/orders_crash", s"$tmp/orders_crash.compact",
      targetBytes = 64L * 1024 * 1024)
    assert(nAfter < nBefore, s"$nAfter !< $nBefore")
    // the crashed leaf was restored AND compacted: no partition lost
    assert(fs.exists(leaf))
    assert(!fs.exists(new Path(s"$tmp/orders_crash/.$leafName.compact-old")))
    val back = spark.read.parquet(s"$tmp/orders_crash")
    assert(back.count() === orders.count())
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ===
      orders.agg(sum("o_orderkey")).head.getLong(0))
    val y = leafName.stripPrefix("o_year=").toInt
    assert(back.where(col("o_year") === y).count() ===
      orders.where(col("o_year") === y).count())
  }

  test("partitioned compaction restores a LEGACY un-dotted aside; refuses an ambiguous one") {
    // ADVICE r15 (medium): a pre-dot-prefix compaction crash left an
    // un-dotted 'X.compact-old' — it fails the hidden-aside restore filter
    // yet passes the subdir filter, so unhandled it would be compacted as a
    // real partition directory and readers would then see a bogus partition
    // value (e.g. o_year='5.compact-old'). Base missing → restore; base
    // present → refuse loudly (ambiguous across the writer upgrade).
    import org.apache.hadoop.fs.Path
    val orders = Tables.orders(spark, sf())
      .withColumn("o_year", year(col("o_orderdate")))
    orders.repartition(4).write.partitionBy("o_year").parquet(s"$tmp/orders_legacy")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val leafName = new java.io.File(s"$tmp/orders_legacy").listFiles()
      .filter(_.isDirectory).map(_.getName).find(_.startsWith("o_year=")).get
    val leaf = new Path(s"$tmp/orders_legacy/$leafName")
    // crash shape 1: data ONLY at the legacy aside — must be restored,
    // compacted as a real leaf, and never read as a partition value
    assert(fs.rename(leaf, new Path(s"$tmp/orders_legacy/$leafName.compact-old")))
    val (nBefore, nAfter) = Sinks.compactPartitionedParquet(
      spark, s"$tmp/orders_legacy", s"$tmp/orders_legacy.compact",
      targetBytes = 64L * 1024 * 1024)
    assert(nAfter < nBefore, s"$nAfter !< $nBefore")
    assert(fs.exists(leaf))
    assert(!fs.exists(new Path(s"$tmp/orders_legacy/$leafName.compact-old")))
    val back = spark.read.parquet(s"$tmp/orders_legacy")
    assert(back.count() === orders.count())
    assert(!back.select("o_year").distinct().collect()
      .map(_.get(0).toString).exists(_.contains("compact-old")))
    // crash shape 2: legacy aside ALONGSIDE its base — ambiguous, refuse
    val dup = new Path(s"$tmp/orders_legacy/$leafName.compact-old")
    assert(org.apache.hadoop.fs.FileUtil.copy(fs, leaf, fs, dup, false,
      spark.sparkContext.hadoopConfiguration))
    val err = intercept[RuntimeException] {
      Sinks.compactPartitionedParquet(
        spark, s"$tmp/orders_legacy", s"$tmp/orders_legacy.compact2",
        targetBytes = 64L * 1024 * 1024)
    }
    assert(err.getMessage.contains("legacy aside"), err.getMessage)
    // ADVICE r16: the message must name the REAL base path the operator has
    // to adjudicate, not a literal '$base' from a missed interpolator
    assert(!err.getMessage.contains("$base"), err.getMessage)
    assert(err.getMessage.contains(leafName), err.getMessage)
    assert(fs.exists(leaf) && fs.exists(dup), "refusal must not touch either copy")
  }

  test("partitioned compaction ignores '_'-prefixed debris (crashed-write _temporary)") {
    import org.apache.hadoop.fs.Path
    val orders = Tables.orders(spark, sf())
      .withColumn("o_year", year(col("o_orderdate")))
    orders.repartition(3).write.partitionBy("o_year").parquet(s"$tmp/orders_dbg")
    // plant crashed-write debris: parquet under _temporary, which every
    // reader ignores (Spark's hidden-path convention covers '_' AND '.').
    // Pre-fix the walk descended into it and either compacted uncommitted
    // data or tripped the mixed-layout guard on the root.
    orders.limit(5).coalesce(1).write
      .parquet(s"$tmp/orders_dbg/_temporary/0/attempt_x")
    val (nb, na) = Sinks.compactPartitionedParquet(
      spark, s"$tmp/orders_dbg", s"$tmp/orders_dbg.compact",
      targetBytes = 64L * 1024 * 1024)
    assert(na <= nb)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$tmp/orders_dbg/_temporary/0/attempt_x")),
      "debris is ignored, not deleted or compacted")
    assert(spark.read.parquet(s"$tmp/orders_dbg").count() === orders.count(),
      "debris rows must not leak into the compacted data")
  }

  test("partitioned compaction refuses a mixed files+subdirs layout loudly") {
    val nation = Tables.nation(spark, sf())
    // broken layout: parquet files AND a partition subdirectory at one level
    nation.repartition(2).write.parquet(s"$tmp/mixed_layout")
    nation.repartition(2).write.parquet(s"$tmp/mixed_layout/k=1")
    val err = intercept[IllegalArgumentException] {
      Sinks.compactPartitionedParquet(
        spark, s"$tmp/mixed_layout", s"$tmp/mixed_layout.compact")
    }
    assert(err.getMessage.contains("mixed layouts are not compactable"), err.getMessage)
    // nothing was renamed or destroyed
    assert(spark.read.parquet(s"$tmp/mixed_layout/k=1").count() === nation.count())
  }

  test("z-ordered layout: per-file 2-D bounding boxes prune on BOTH columns") {
    // 256x256 grid, 16 output files. Linear-by-x stripes each span ALL of y,
    // so a y-only predicate can never skip a file; z-order tiles the plane,
    // so min/max stats bound BOTH columns per file.
    val n = 65536L
    val grid = spark.range(n).select(
      (col("id") % 256).as("x"), expr("id div 256").as("y"))
    Sinks.writeZOrdered(grid, s"$tmp/zorder", "x", "y", files = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$tmp/zlinear")
    def boxes(p: String) = spark.read.parquet(p)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
           min("y").as("y0"), max("y").as("y1"))
      .collect()
    // which files COULD hold rows with y in [80, 111] (the min/max skip test
    // a stats-aware reader runs per file / row group)
    def touchedY(p: String) = boxes(p).count(r =>
      !(r.getAs[Long]("y1") < 80 || r.getAs[Long]("y0") > 111))
    val (zy, ly) = (touchedY(s"$tmp/zorder"), touchedY(s"$tmp/zlinear"))
    assert(ly === 16, s"every x-stripe spans all y, got $ly")
    assert(zy <= 6, s"z-order should confine a y-band to ~one tile row, got $zy")
    // a 2-D box stays pruned too: x,y both in [80, 111]
    def touchedBox(p: String) = boxes(p).count(r =>
      !(r.getAs[Long]("x1") < 80 || r.getAs[Long]("x0") > 111 ||
        r.getAs[Long]("y1") < 80 || r.getAs[Long]("y0") > 111))
    assert(touchedBox(s"$tmp/zorder") <= 6, s"box: ${touchedBox(s"$tmp/zorder")}")
    // layout is a pure permutation: same rows, same count
    val back = spark.read.parquet(s"$tmp/zorder")
    assert(back.count() === n)
    assert(back.agg(sum(col("x") * 1000 + col("y"))).head.getLong(0) ===
      grid.agg(sum(col("x") * 1000 + col("y"))).head.getLong(0))
  }

  test("z-ordered layout: 3 columns — per-file 3-D boxes prune on the third axis too") {
    // 32x32x32 cube, 16 files. Linear-by-x can never skip on z; 3-D Morton
    // tiles confine a z-band to a fraction of the files.
    val n = 32768L
    val cube = spark.range(n).select(
      (col("id") % 32).as("x"), (expr("id div 32") % 32).as("y"),
      expr("id div 1024").as("z"))
    Sinks.writeZOrdered(cube, s"$tmp/z3", Seq("x", "y", "z"), files = 16, bits = 8)
    cube.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$tmp/z3linear")
    def touchedZ(p: String) = spark.read.parquet(p)
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("z0"), max("z").as("z1"))
      .collect().count(r =>
        !(r.getAs[Long]("z1") < 8 || r.getAs[Long]("z0") > 15))
    assert(touchedZ(s"$tmp/z3linear") === 16, "x-stripes span all z")
    assert(touchedZ(s"$tmp/z3") <= 8, s"3-D tiles should skip most files for a z-band, got ${touchedZ(s"$tmp/z3")}")
    // pure permutation: same rows
    val back = spark.read.parquet(s"$tmp/z3")
    assert(back.count() === n)
    assert(back.agg(sum(col("x") * 100000 + col("y") * 100 + col("z"))).head.getLong(0) ===
      cube.agg(sum(col("x") * 100000 + col("y") * 100 + col("z"))).head.getLong(0))
  }

  test("dynamic partition overwrite: only updated leaves rewrite, history is byte-identical") {
    val orders = Tables.orders(spark, sf()).withColumn("o_year", year(col("o_orderdate")))
    Sinks.writePartitionedParquet(orders, s"$tmp/upsert", "o_year")
    val years = new java.io.File(s"$tmp/upsert").listFiles()
      .filter(_.isDirectory).map(_.getName.stripPrefix("o_year=").toInt).sorted
    assert(years.length >= 2, s"need >=2 partitions, got ${years.toSeq}")
    val (touched, untouched) = (years.head, years.last)
    def leafFiles(y: Int) = new java.io.File(s"$tmp/upsert/o_year=$y").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    val before = leafFiles(untouched)
    // corrected data for ONE year: totalprice doubled
    val corrected = orders.where(col("o_year") === touched)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Sinks.overwritePartitions(corrected, s"$tmp/upsert", "o_year")
    // untouched leaf: same file names, same mtimes — never rewritten
    assert(leafFiles(untouched) === before)
    val back = spark.read.parquet(s"$tmp/upsert")
    // replaced leaf carries the corrected values; row counts unchanged
    assert(back.count() === orders.count())
    val gotSum = back.where(col("o_year") === touched)
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(14,2))"))).head.getDecimal(0)
    val wantSum = corrected
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(14,2))"))).head.getDecimal(0)
    assert(gotSum === wantSum)
  }

  test("nightly sequence: upsert -> compaction -> pruned read composes (VERDICT r9 #3)") {
    // The maintenance sequence a production lake actually runs, as ONE flow:
    // late-data dynamic-partition upsert into an over-parallel lake, then
    // whole-lake compaction, then a partition-pruned read — proving contents,
    // untouched-leaf file identity across the upsert, and that
    // PartitionFilters survive the composition (each step was only spec'd
    // solo before).
    val orders = Tables.orders(spark, sf()).withColumn("o_year", year(col("o_orderdate")))
    val lake = s"$tmp/nightly"
    // over-parallel ingest: every o_year= leaf holds up to 6 small files
    orders.repartition(6).write.partitionBy("o_year").parquet(lake)
    val years = new java.io.File(lake).listFiles()
      .filter(_.isDirectory).map(_.getName.stripPrefix("o_year=").toInt).sorted
    assert(years.length >= 2, s"need >=2 partitions, got ${years.toSeq}")
    val (touched, untouched) = (years.head, years.last)
    def leafFiles(y: Int) = new java.io.File(s"$lake/o_year=$y").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified()).toMap
    val beforeUpsert = leafFiles(untouched)

    // 1) the late-data upsert: one year's totalprice corrected
    val corrected = orders.where(col("o_year") === touched)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Sinks.overwritePartitions(corrected, lake, "o_year")
    // untouched leaf untouched by the upsert: same files, same mtimes
    assert(leafFiles(untouched) === beforeUpsert)

    // 2) the compaction pass over the whole lake
    val (nBefore, nAfter) = Sinks.compactPartitionedParquet(
      spark, lake, s"$lake.compact", targetBytes = 64L * 1024 * 1024)
    assert(nAfter < nBefore, s"$nAfter !< $nBefore")
    assert(!new java.io.File(s"$lake.compact").exists())

    // 3) the pruned read over the composed result
    val expected = orders.where(col("o_year") =!= touched).unionByName(corrected)
    val back = spark.read.parquet(lake)
    assert(back.count() === expected.count())
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .agg(sum("o_orderkey"), sum(expr("CAST(o_totalprice AS DECIMAL(16,2))"))).head
    assert(sums(back).getLong(0) === sums(expected).getLong(0))
    assert(sums(back).getDecimal(1) === sums(expected).getDecimal(1))
    // partition pruning reaches the scan AFTER upsert+compaction, on both
    // the corrected and an untouched partition
    for (y <- Seq(touched, untouched)) {
      val pruned = back.where(col("o_year") === y)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
      assert(pruned.count() === expected.where(col("o_year") === y).count())
    }
  }

  test("partitioned parquet: hive layout + partition pruning at the scan") {
    val orders = Tables.orders(spark, sf())
      .withColumn("o_year", year(col("o_orderdate")))
    Sinks.writePartitionedParquet(orders, s"$tmp/orders_by_year", "o_year")

    // hive-style directories exist
    val dirs = new java.io.File(s"$tmp/orders_by_year").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("o_year=")))

    // a filter on the partition column becomes a PartitionFilter, and the
    // pruned read returns exactly the partition's rows
    val back = spark.read.parquet(s"$tmp/orders_by_year")
    val y = dirs.head.stripPrefix("o_year=").toInt
    val pruned = back.where(col("o_year") === y)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    assert(pruned.count() === orders.where(col("o_year") === y).count())
  }

  test("csv round-trip preserves values (schema re-inferred)") {
    val df = Tables.nation(spark, sf()).select("n_nationkey", "n_name")
    Sinks.writeCsv(df, s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() === df.count())
    assert(back.select("n_name").collect().map(_.getString(0)).toSet ===
      df.select("n_name").collect().map(_.getString(0)).toSet)
  }

  test("bucketed tables join without a shuffle") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // force the join to show its shuffle needs
      val o = Tables.orders(spark, sf()).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
      Sinks.writeBucketedTable(o, "graft_orders_b", "o_orderkey", 4)
      Sinks.writeBucketedTable(l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "graft_lineitem_b", "o_orderkey", 4)
      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"), "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // bucket co-location: no shuffle exchange anywhere in the join plan
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === Tables.lineitem(spark, sf()).count())
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("json round-trip preserves values and types") {
    val df = Tables.region(spark, sf())
    Sinks.writeJson(df, s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
    assert(back.count() === df.count())
    assert(back.select("r_name").collect().map(_.getString(0)).toSet ===
      df.select("r_name").collect().map(_.getString(0)).toSet)
  }

  test("orc: partitioned round-trip with pruning and pushdown at the scan") {
    val orders = Tables.orders(spark, sf())
      .withColumn("o_year", year(col("o_orderdate")))
    Sinks.writeOrc(orders, s"$tmp/orders_orc", "o_year")
    val back = spark.read.orc(s"$tmp/orders_orc")
    assert(back.count() === orders.count())
    val y = new java.io.File(s"$tmp/orders_orc").listFiles()
      .filter(_.isDirectory).map(_.getName).find(_.startsWith("o_year="))
      .get.stripPrefix("o_year=").toInt
    val pruned = back.where(col("o_year") === y && col("o_totalprice") > 1000.0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    assert(plan.contains("PushedFilters: [") && plan.contains("o_totalprice"), plan)
    assert(pruned.count() ===
      orders.where(col("o_year") === y && col("o_totalprice") > 1000.0).count())
  }
}
