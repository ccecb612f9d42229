package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // Spark 4.1 false-positive: join -> rollup trips DetectAmbiguousSelfJoin
      // events.ts is TIMESTAMP(NANOS): read as Long, converted in Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest scale: first-touch costs (parquet reader
    // init, codegen compiler, shuffle/broadcast machinery, JIT) are one-time
    // per JVM and land on whichever query happens to run first in the map's
    // arbitrary order — inflating that query's number by seconds while every
    // later query of the same shape runs 5-10x faster. Touch each subsystem
    // once so the timed numbers below are steady-state and order-insensitive
    // (same move as Experiments' untimed warmup; the reference harness's row 1
    // absorbs its warmup the same way and is excluded from its steady rows).
    val warm = sfDir.stripSuffix("/").replaceAll("sf[0-9.]+$", "sf0.001")
    if (warm == sfDir.stripSuffix("/")) {
      // No sf-suffix to rewrite (ADVICE r03): warming up at full scale would
      // silently ~double wall time — skip it and say so; first-query numbers
      // then include one-time JVM/codegen warmup.
      System.err.println(s"[bench] sfDir '$sfDir' has no sfN.NN suffix; skipping warmup")
    } else {
      System.err.println(s"[bench] warmup at $warm")
      for (q <- Seq("q3_join_agg", "e2_sessions", "t1_token_stats", "d3_minhash_lsh",
                    "s2_knn_lsh", "m1_binary_meta", "ccf_components"))
        try SparkEntry.queries(q)(spark, warm).count()
        catch { case _: Throwable => () }
    }
    // Dev loop: SPARK_GRAFT_ONLY=q1_agg,ccf_components times a subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    // Noise robustness (VERDICT r04 #3): one CPU-contention blip on a single
    // timing flipped a whole round's contract signal (a reproduced-0.5 s query
    // recorded at 34.6 s). Run the full suite SPARK_GRAFT_PASSES times (default
    // 2) in the same fixed order and report each query's MIN across passes.
    // Memoized derived tables (jaccard pairs, CCF assignments) are evicted at
    // the start of EVERY pass, so each pass re-pays fixpoint/build costs with
    // the same first-of-family attribution as a single run — a later pass's
    // cache hit can never masquerade as query time.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    val qseq = selected.toSeq
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (pass <- 1 to passes) {
      graft.queries.DedupQueries.clearCaches(spark)
      graft.queries.GraphQueries.clearCaches(spark)
      for ((name, fn) <- qseq) {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            // a failing query must be visible — and its time-to-failure must
            // NOT enter the min (a fast crash would mask a real pass timing)
            System.err.println(s"[bench] $name FAILED (pass $pass): ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) {
          val prev = best.getOrElse(name, Double.MaxValue)
          best(name) = if (prev < 0) dt else math.min(prev, dt)
        } else if (!best.contains(name)) best(name) = -1.0 // every pass failed
      }
    }
    val results = qseq.map { case (name, _) => name -> best(name) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes}""")
    // The full line above grows with the query count (83 queries outran the
    // driver's tail-capture window in r6 — BENCH_r06.json parsed: null). Emit
    // a SHORT self-contained summary line LAST so a bounded tail always holds
    // one complete parsable JSON record of the headline number.
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"slowest":$slowest,"sf":"$sfDir","passes":$passes}""")
    spark.stop()
  }
}
