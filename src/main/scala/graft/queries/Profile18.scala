package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextFunctions.HashP

/** r18 optimization-round scratch profiler: times the internal stages of the
  * hottest bench items (t6, pipeline_day2_admission) with the noop sink
  * (guide §1.4) so the per-stage split is measurable. Not part of any gate;
  * deleted or kept as a tool — never called by Verify/Bench.
  */
object Profile18 {
  private def timeIt(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    System.err.println(f"[prof] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val what = if (args.nonEmpty) args(0) else "t6"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch subsystems once (JIT/codegen/parquet) like Bench does
    val warm = sfDir.stripSuffix("/").replaceAll("sf[0-9.]+$", "sf0.001")
    for (q <- Seq("q3_join_agg", "t1_token_stats", "d3_minhash_lsh"))
      try graft.SparkEntry.queries(q)(spark, warm).count() catch { case _: Throwable => () }

    what match {
      case "t6" => profileT6(spark, sfDir)
      case "day2" => profileDay2(spark, sfDir)
      case "g2" => profileG2(spark, sfDir)
      case "p5" => profileP5(spark, sfDir)
      case x => System.err.println(s"unknown target $x")
    }
    spark.stop()
  }

  /** r19 (VERDICT r18 #6): stage-by-stage owner for p5/p4_anchored's time —
    * times each CorpusStages lazy-val materialization of the cut/curated
    * tail in dependency order, so every second has a named stage. */
  private def profileP5(spark: SparkSession, sfDir: String): Unit = {
    for (round <- 1 to 2) {
      System.err.println(s"--- p5 round $round ---")
      PipelineQueries.clearCaches(spark)
      var st: PipelineQueries.CorpusStages = null
      timeIt("day1 stages (s1-s5, bloom, thFrozen)") {
        st = PipelineQueries.profilingStages(spark, sfDir)
      }
      timeIt("cutDocs (d14/d15 span cut over s4)") { st.cutDocs.count() }
      timeIt("cutDocsAnchored (d16 dial)") { st.cutDocsAnchored.count() }
      timeIt("s4c (re-admit cut, minhash LSH)") { st.s4c.count() }
      timeIt("s4ca (re-admit anchored cut)") { st.s4ca.count() }
      timeIt("s5cap (c10 domain cap)") { st.s5cap.count() }
      timeIt("s5mix (c9 temperature mix)") { st.s5mix.count() }
      timeIt("p5 assembly (flags + shard pack)") {
        noop(PipelineQueries.pipelineCuratedOf(st))
      }
      timeIt("p4_anchored assembly") {
        noop(PipelineQueries.pipelineCutAnchoredOf(st))
      }
    }
  }

  /** r19: per-round timing of the g2 PageRank shapes — the r18 verdict's #1
    * (zero-exchange rounds regressed 5x at 32 cores in the driver's env).
    * Variants, all broadcast-rank (the bound=0 full-shuffle A/B already
    * measured far worse): A = r18 zero-exchange (dst-partitioned outE,
    * complete-mode agg); B = r17 shape (plain-checkpointed outE, per-round
    * partial agg + exchange). Each round timed through its checkpoint. */
  private def profileG2(spark: SparkSession, sfDir: String): Unit = {
    import graft.Checkpoints.EagerOps
    import graft.ccf.CCF
    val spark2 = spark
    for (round <- 1 to 2) {
      System.err.println(s"--- g2 round $round ---")
      val e = graft.graph.GraphBuilders.copurchaseEdges(spark2, sfDir).eagerCheckpoint()
      val deg = CCF.bidirect(e).groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")).eagerCheckpoint()
      val degO = deg.select(col("node").as("src"), col("deg").as("outdeg"))
      val n = degO.count()
      def rounds(tag: String, outE: DataFrame): Unit = {
        var ranks = degO.select(col("src").as("node"), lit(1.0 / n).as("rank"))
        for (i <- 1 to GraphQueries.PagerankIters) {
          timeIt(s"$tag round $i") {
            ranks = GraphQueries.pagerankParityStep(outE, broadcast(ranks), 0.15 / n)
              .eagerCheckpoint()
          }
        }
        timeIt(s"$tag final count") { ranks.count() }
      }
      var outEA: DataFrame = null
      timeIt("A build (repartition dst, keepPart)") {
        outEA = CCF.bidirect(e).join(broadcast(degO), "src")
          .repartition(col("dst")).eagerCheckpointKeepPartitioning()
      }
      rounds("A zero-exchange", outEA)
      var outEB: DataFrame = null
      timeIt("B build (plain ckpt)") {
        outEB = CCF.bidirect(e).join(broadcast(degO), "src").eagerCheckpoint()
      }
      rounds("B r17 agg-exchange", outEB)
    }
  }

  private def profileT6(spark: SparkSession, sfDir: String): Unit = {
    for (round <- 1 to 2) {
      System.err.println(s"--- t6 round $round ---")
      val documents = Tables.documents(spark, sfDir)
      import graft.Checkpoints.EagerOps
      val maxDf = TextQueries.MaxTermDf
      var tf: DataFrame = null
      var wts: DataFrame = null
      var nrm: DataFrame = null
      var joined: DataFrame = null
      var survivors: DataFrame = null
      var num: DataFrame = null
      timeIt("tf ckpt (gram explode + tf agg)") {
        val grams = documents.select(col("doc_id"),
          explode(graft.functions.VectorFunctions.shingleHashesAll(col("text"), 3, HashP)).as("g"))
        tf = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("tf")).eagerCheckpoint()
      }
      timeIt("wts ckpt (df agg + join)") {
        val dfq = tf.groupBy("g").agg(count(lit(1)).as("df")).where(col("df") <= maxDf)
        val nDf = documents.agg(count(lit(1)).as("n"))
        wts = tf.join(dfq, "g").crossJoin(broadcast(nDf))
          .select(col("doc_id"), col("g"),
            (col("tf").cast("double") * (col("n").cast("double") / col("df").cast("double"))).as("wt"))
          .eagerCheckpoint()
      }
      def sortedSum(gCol: org.apache.spark.sql.Column, term: org.apache.spark.sql.Column) =
        graft.functions.VectorFunctions.sortedTermSum(
          collect_list(struct(gCol.as("g"), term.as("t"))))
      timeIt("nrm ckpt (sortedTermSum norms)") {
        nrm = wts.groupBy("doc_id")
          .agg(sqrt(sortedSum(col("g"), col("wt") * col("wt"))).as("nrm")).eagerCheckpoint()
      }
      timeIt("joined ckpt (pair fan-out)") {
        joined = wts.as("a").join(wts.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("a.g").as("g"),
            (col("a.wt") * col("b.wt")).as("t"))
          .eagerCheckpoint()
      }
      timeIt("survivors (approx prefilter)") {
        survivors = joined.groupBy("doc_a", "doc_b").agg(sum(col("t")).as("raw"))
          .join(nrm.select(col("doc_id").as("doc_a"), col("nrm").as("na")), "doc_a")
          .join(nrm.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), "doc_b")
          .where(col("raw") / (col("na") * col("nb")) >= 0.5 - 1e-9)
          .eagerCheckpoint()
      }
      timeIt("num (semi-join + sortedTermSum)") {
        num = joined.join(survivors, Seq("doc_a", "doc_b"), "left_semi")
          .groupBy("doc_a", "doc_b")
          .agg(sortedSum(col("g"), col("t")).as("num")).eagerCheckpoint()
      }
      timeIt("final joins + filter") {
        noop(num
          .join(nrm.select(col("doc_id").as("doc_a"), col("nrm").as("na")), "doc_a")
          .join(nrm.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), (col("num") / (col("na") * col("nb"))).as("cos_tfidf"))
          .where(col("cos_tfidf") >= 0.5))
      }
      timeIt("t6 end-to-end (count, as bench)") {
        TextQueries.defs("t6_tfidf_pairs")(spark, sfDir).count()
      }
    }
  }

  private def profileDay2(spark: SparkSession, sfDir: String): Unit = {
    for (round <- 1 to 2) {
      System.err.println(s"--- day2 round $round ---")
      PipelineQueries.clearCaches(spark)
      var st: PipelineQueries.CorpusStages = null
      timeIt("day1 stages (corpus build)") {
        st = PipelineQueries.profilingStages(spark, sfDir)
      }
      import graft.Checkpoints.EagerOps
      val day2 = CurationQueries.saltedHash("day2", col("doc_id")) % 100 < 10
      var batch0: DataFrame = null
      var b1: DataFrame = null
      var binst: DataFrame = null
      var b2: DataFrame = null
      var b3: DataFrame = null
      timeIt("batch0 ckpt") {
        batch0 = st.documents.where(!CurationQueries.samplePred && day2).eagerCheckpoint()
      }
      timeIt("b1 decontam ckpt") {
        val bhit = st.g8(batch0.where(col("doc_id") % 20 =!= 0))
          .where(graft.functions.BloomFunctions.mightContain(st.bloom, col("g")))
          .join(st.bench, "g").select("doc_id").distinct()
        b1 = batch0.where(col("doc_id") % 20 =!= 0)
          .join(bhit, Seq("doc_id"), "left_anti").eagerCheckpoint()
      }
      timeIt("binst ckpt (bigram instances)") {
        binst = TextQueries.bigramInstancesOf(b1).eagerCheckpoint()
      }
      timeIt("b2 frozen quality gate ckpt") {
        val corpusInst = st.corpusInst
        val cnt = corpusInst.join(binst.select("g").distinct(), Seq("g"), "left_semi")
          .groupBy("g").agg(count(lit(1)).as("c"))
        val pre = corpusInst.join(binst.select("pg").distinct(), Seq("pg"), "left_semi")
          .groupBy("pg").agg(count(lit(1)).as("c1"))
        val bp = binst.join(cnt, Seq("g"), "left").join(pre, Seq("pg"), "left")
          .select(col("doc_id"), col("g"),
            coalesce(col("c").cast("double") / col("c1").cast("double"), lit(0.0)).as("p"))
        val bscore = bp.groupBy("doc_id").agg(
          (graft.functions.VectorFunctions.sortedTermSum(
            collect_list(struct(col("g").as("g"), col("p").as("t"))))
            / count(lit(1))).as("avg_p"))
        val passQ = bscore.join(b1.select("doc_id", "lang"), "doc_id")
          .join(broadcast(st.thFrozen), "lang")
          .where(col("avg_p") >= col("p30")).select("doc_id")
        b2 = b1.join(passQ, Seq("doc_id")).eagerCheckpoint()
      }
      timeIt("b3 incrementalDedup (vs kept corpus)") {
        val shAll = DedupQueries.shingleSets(spark, sfDir)
        val bkAll = DedupQueries.bandIndex(spark, sfDir)
        val s5ids = st.s5.select("doc_id")
        val b2ids = b2.select("doc_id")
        b3 = DedupQueries.incrementalDedup(st.s5, b2,
          oldIndex = Some(bkAll.join(s5ids, Seq("doc_id"), "left_semi")),
          oldShingles = Some(shAll.join(s5ids, Seq("doc_id"), "left_semi")),
          newShingles = Some(shAll.join(b2ids, Seq("doc_id"), "left_semi")),
          newBandIndex = Some(bkAll.join(b2ids, Seq("doc_id"), "left_semi"))).eagerCheckpoint()
      }
      timeIt("verdict assembly + noop") {
        val b4 = b3.where(CurationQueries.mixPred)
        def flag(ids: DataFrame, name: String) =
          ids.select(col("doc_id")).withColumn(name, lit(true))
        def bit(name: String, v: Int) = when(col(name), v).otherwise(0)
        noop(batch0.select("doc_id")
          .join(flag(b1, "k1"), Seq("doc_id"), "left")
          .join(flag(b2, "k2"), Seq("doc_id"), "left")
          .join(flag(b3, "k3"), Seq("doc_id"), "left")
          .join(flag(b4, "k4"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            (bit("k1", PipelineQueries.Bit2Decontam) + bit("k2", PipelineQueries.Bit2Quality) +
              bit("k3", PipelineQueries.Bit2Admitted) + bit("k4", PipelineQueries.Bit2Mixture))
              .cast("int").as("admit_reason")))
      }
    }
  }
}
