package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation family behavior: reproducible selection, exact stratum sizes,
  * mixture rates, decontamination invariants. */
class CurationSpec extends SparkSpec {

  test("c1: deterministic — identical row set on re-run, and a ~10% rate") {
    val a = CurationQueries.defs("c1_hash_sample")(spark, sf()).collect().toSet
    val b = CurationQueries.defs("c1_hash_sample")(spark, sf()).collect().toSet
    assert(a === b)
    val total = graft.sources.Tables.documents(spark, sf()).count()
    // hash-uniform keep rate: loose band around 10% for a small corpus
    assert(a.size > 0 && a.size < total / 4, s"kept ${a.size} of $total")
  }

  test("c2: exactly k docs per stratum, ranks dense from 1, sampled ids exist") {
    val df = CurationQueries.defs("c2_stratified_sample")(spark, sf())
    val perLang = df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = graft.sources.Tables.documents(spark, sf())
      .select("lang").distinct().count()
    assert(perLang.size === langs.toInt)
    assert(perLang.values.forall(_ === 20L), perLang.toString)
    val ranks = df.where(col("lang") === perLang.keys.head)
      .select("rank").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq === (1 to 20))
  }

  test("c3: per-source keep counts never exceed the source size; rates ordered") {
    val kept = CurationQueries.defs("c3_source_mixture")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = graft.sources.Tables.documents(spark, sf())
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.forall { case (s, n) => n <= sizes(s) }, kept.toString)
    // a 100%-rate source (idx % 4 == 3) keeps everything
    val full = sizes.keys.filter(s => s.stripPrefix("src").toInt % 4 == 3)
    assert(full.forall(s => kept.get(s).contains(sizes(s))), kept.toString)
  }

  test("c9: per-source counts equal floor'd sqrt-weight targets; mixture flattens") {
    val kept = CurationQueries.defs("c9_temperature_mix")(spark, sf())
      .collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sizes = graft.sources.Tables.documents(spark, sf())
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver replica of the targets: k_s = floor(200 * sqrt(n_s) / sum sqrt)
    val bySrc = sizes.toSeq.sortBy(_._1.stripPrefix("src").toInt)
    val t = bySrc.foldLeft(0.0)((a, sn) => a + math.sqrt(sn._2.toDouble))
    val targets = bySrc.map { case (s, n) =>
      s -> math.floor(200 * math.sqrt(n.toDouble) / t).toLong }.toMap
    targets.foreach { case (s, k) =>
      assert(kept.getOrElse(s, 0L) === k, s"source $s")
    }
    // alpha < 1 flattens the mixture: the smallest source's kept SHARE must
    // exceed its corpus share when sizes differ (uniform corpus -> equal
    // shares, so assert on a planted skewed copy instead of the corpus)
    val total = sizes.values.sum.toDouble
    val keptTotal = kept.values.sum.toDouble
    val (minSrc, minN) = sizes.minBy(_._2)
    if (minN < sizes.values.max)
      assert(kept.getOrElse(minSrc, 0L) / keptTotal > minN / total,
        s"smallest source $minSrc not upweighted")
    else // uniform corpus: targets must be (near-)equal across sources
      assert(kept.values.max - kept.values.min <= 1, kept.toString)
  }

  test("c5: every doc redacted — zero residual matches, counts as planted") {
    val df = CurationQueries.defs("c5_pii_redact")(spark, sf())
    val rows = df.collect()
    val total = graft.sources.Tables.documents(spark, sf()).count()
    assert(rows.length === total.toInt)
    for (r <- rows) {
      val (id, nEmails, nPhones) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(nEmails === (if (id % 3 == 0) 2 else 1), r.toString)
      assert(nPhones === 1, r.toString)
    }
  }

  test("c6: shard assignment equals a driver-side sequential pack; shards dense") {
    val rows = CurationQueries.defs("c6_shard_pack")(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // oracle-style sequential recompute on the driver (tiny at test sf)
    val h = graft.text.TextFunctions.polyHash(
      concat(lit("shard:"), col("doc_id").cast("string")))
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), col("n_chars").cast("long"),
        (h * h + h) % graft.text.TextFunctions.HashP) // saltedHash finalizer
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var run = 0L
    for ((id, n, _) <- docs) {
      val expected = run / 20000L
      assert(rows(id) === (n, expected), s"doc $id")
      run += n
    }
    // shards cover 0..max densely
    val shards = rows.values.map(_._2).toSet
    assert(shards === (0L to shards.max).toSet)
  }

  test("c6 property: distributed pack == sequential pack across random corpora/partitionings") {
    import spark.implicits._
    val hash = (id: Long) => {
      var h = 0L
      for (c <- s"shard:$id") h = (h * 31 + c.toLong) % 1000000007L
      (h * h + h) % 1000000007L // the saltedHash square finalizer
    }
    for (seed <- Seq(3, 21, 77)) {
      val rng = new scala.util.Random(seed)
      val n = 50 + rng.nextInt(400)
      val budget = 500L + rng.nextInt(5000)
      val docs = (0 until n).map(_ => rng.nextLong(1L << 40))
        .distinct.map(id => (id, 1L + rng.nextInt(800)))
      // sequential oracle over the salted-hash global order
      var run = 0L
      val expected = docs.map { case (id, nc) => (id, hash(id), nc) }
        .sortBy(t => (t._2, t._1))
        .map { case (id, _, nc) => val sh = run / budget; run += nc; id -> sh }
        .toMap
      // exercise partition-count invariance too
      val parts = 1 + rng.nextInt(13)
      val df = docs.toDF("doc_id", "n_chars").repartition(parts)
      val got = CurationQueries.shardPackOf(df, budget)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected, s"seed=$seed parts=$parts budget=$budget")
    }
  }

  test("c10: per-domain counts = min(domain size, cap); ranks dense; cap binds both ways") {
    import org.apache.spark.sql.functions._
    val kept = CurationQueries.defs("c10_domain_cap")(spark, sf()).collect()
    val sizes = graft.sources.Tables.documents(spark, sf())
      .groupBy(concat(col("lang"), lit("."), col("source")).as("domain"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byDomain = kept.groupBy(_.getString(0))
    // every domain appears, truncated to the cap
    assert(byDomain.keySet === sizes.keySet)
    for ((dom, rows) <- byDomain) {
      assert(rows.length.toLong === math.min(sizes(dom), 8L), dom)
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length), s"$dom ranks")
    }
    // the gate corpus exercises both sides: some domain is actually capped,
    // some passes through whole
    assert(sizes.values.exists(_ > 8), "fixture regression: no domain above the cap")
    assert(sizes.values.exists(_ <= 8), "fixture regression: no domain below the cap")
  }

  test("c4: invariants — no benchmark docs, shared <= total, flag == threshold") {
    val rows = CurationQueries.defs("c4_decontam")(spark, sf()).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id, n, sh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(id % 20 != 0, s"benchmark doc $id in candidates")
      assert(sh >= 0 && sh <= n, r.toString)
      assert(r.getBoolean(4) === (r.getDouble(3) >= 0.5), r.toString)
    }
  }
}
