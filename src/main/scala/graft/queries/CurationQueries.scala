package graft.queries

import graft.sources.Tables
import graft.text.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dataset-curation operators (driver north-star: "the operations a
 * large-scale training-data pipeline would need") — the selection/mixing
 * stages that sit between dedup/quality and training:
 *
 *  - c1 deterministic Bernoulli sampling (seeded, reproducible, map-side)
 *  - c2 stratified sampling: exact k per stratum via the bounded-state
 *    top-k AGGREGATE (no partition-wide sort — the 100 TB shape)
 *  - c3 source mixing: per-source keep rates (down/up-weighting corpora
 *    to a target mixture), map-side
 *  - c4 benchmark decontamination: n-gram overlap against a held-out
 *    eval set via a semi-join on hashed 8-gram shingles
 *
 * Determinism contract: all "randomness" is the shared polynomial hash
 * ([[graft.text.TextFunctions.polyHash]]) of a salted key, mirrored
 * bit-identically in the DuckDB oracles — re-running any stage on any
 * cluster layout selects the SAME rows (sampling by coin-flip `rand()`
 * would be irreproducible across retries and unverifiable by an oracle).
 */
object CurationQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** The c1 sampler as a standalone transform: STATELESS (pure row-local
    * filter), so the identical code runs on a batch DataFrame or a stream
    * ([[graft.streaming.Streams.sampleStream]]) — and selects the same rows
    * either way, which `rand()`-based sampling cannot promise under stream
    * replays/retries. */
  def hashSampled(documents: DataFrame): DataFrame =
    documents
      .where(saltedHash("smpl", col("doc_id")) % 100 < 10)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** Salted uniform hash in [0, HashP): h("salt:" + key). Distinct salts
    * decorrelate the stages (a doc sampled by c1 is not thereby more or less
    * likely to be picked by c2/c3). */
  private def saltedHash(salt: String, key: org.apache.spark.sql.Column) =
    polyHash(concat(lit(salt + ":"), key.cast("string")))

  private def saltedHashSql(salt: String, keyExpr: String) =
    polyHashSql(s"'$salt:' || CAST($keyExpr AS VARCHAR)")

  /** c2: exact per-stratum sample size. */
  private val StratumK = 20

  /** c4: contamination flag threshold (fraction of a doc's distinct 8-grams
    * also present in the benchmark side). */
  private val ContamT = 0.5

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic Bernoulli sample, keep rate 10%: pure map-side filter —
    // no shuffle, no driver state, reproducible under retries/re-runs.
    // 100 TB notes: this is a scan + filter; with the selection pushed to the
    // parquet reader the sample never materializes the skipped 90%. text is
    // NOT selected — column pruning keeps the wide column out of the scan.
    "c1_hash_sample" -> ((s, d) => hashSampled(docs(s, d))),

    // Stratified sampling: EXACTLY k docs per stratum (lang), chosen by the
    // salted hash as a uniform score — via the bounded-state top-k aggregate
    // ([[graft.functions.TopKByScore]]), NOT a row_number window: partial
    // top-k states combine map-side, each map task ships <= k entries per
    // stratum, and no partition-wide sort runs. With a handful of strata and
    // 100 TB of rows, the window form would sort entire strata on single
    // reducers (the classic stratified-sampling straggler); this shuffles
    // O(strata x k) rows total. score = h/P is one IEEE division of exact
    // integers — bit-identical in the oracle.
    "c2_stratified_sample" -> ((s, d) =>
      docs(s, d)
        .select(col("lang"), col("doc_id"),
          (saltedHash("strat", col("doc_id")).cast("double") / HashP).as("score"))
        .groupBy("lang")
        .agg(graft.functions.TopK.topK(col("score"), col("doc_id"), StratumK).as("tk"))
        .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
          col("e.id").as("doc_id"), col("e.score").as("score"))),

    // Source mixing: per-source keep rates 10/25/50/100% by source index mod
    // 4 — the down/up-weighting step that shapes a training mixture. Same
    // map-side determinism as c1; the rollup reports the achieved mixture
    // (doc and char volume per source).
    "c3_source_mixture" -> ((s, d) => {
      val idx = substring(col("source"), 4, 10).cast("int")
      val ratePct = element_at(array(lit(10), lit(25), lit(50), lit(100)),
        (idx % 4 + 1).cast("int"))
      docs(s, d)
        .where(saltedHash("mix", col("doc_id")) % 100 < ratePct)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
    }),

    // Benchmark decontamination: docs sharing too many distinct hashed
    // 8-gram shingles with a held-out benchmark set (here: doc_id % 20 == 0,
    // standing in for an eval-suite corpus) get flagged. Shape: distinct
    // shingles per doc (codegen ShingleHashes), benchmark gram set distinct,
    // then a LEFT SEMI join counts each candidate's shared grams — no pair
    // fan-out anywhere (a candidate gram matches the bench SET, not each
    // bench doc), so worst case is O(|candidate grams|) join rows.
    // 100 TB notes: real benchmark corpora are tiny relative to training
    // data — the bench gram set broadcasts and the semi-join is map-side;
    // 8-gram shingles are near-unique, so no hot-key cap is needed (cf. the
    // d2/t6 df cap, where 3-grams ARE stop-phrase-prone). Docs under 8 words
    // have no 8-gram and are out of scope on both engines.
    "c4_decontam" -> ((s, d) => {
      val g8 = docs(s, d).select(col("doc_id"),
        explode(graft.functions.VectorFunctions.shingleHashes(col("text"), 8, HashP)).as("g"))
      val bench = g8.where(col("doc_id") % 20 === 0).select("g").distinct()
      val cand = g8.where(col("doc_id") % 20 =!= 0)
      val tot = cand.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val hit = cand.join(bench, Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      val shared = coalesce(col("n_shared"), lit(0L))
      tot.join(hit, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"), shared.as("n_shared"),
          (shared.cast("double") / col("n_grams")).as("contamination"),
          (shared.cast("double") / col("n_grams") >= ContamT).as("flagged"))
    })
  )

  private val toks = tokensSql("text")

  private def gram8Sql: String =
    polyHashSql((1 to 8).map(j => s"ws[i+$j]").mkString(" || ' ' || "))

  val oracles: Map[String, String] = Map(
    "c1_hash_sample" ->
      s"""SELECT doc_id, lang, source, n_chars
         |FROM documents
         |WHERE ${saltedHashSql("smpl", "doc_id")} % 100 < 10""".stripMargin,

    "c2_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    CAST(${saltedHashSql("strat", "doc_id")} AS DOUBLE) / $HashP AS score
         |  FROM documents)
         |SELECT lang, CAST(rank AS INT) AS rank, doc_id, score FROM (
         |  SELECT lang, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM h)
         |WHERE rank <= $StratumK""".stripMargin,

    "c3_source_mixture" ->
      s"""SELECT source, COUNT(*) AS n_kept, SUM(n_chars) AS chars_kept
         |FROM (
         |  SELECT source, n_chars,
         |    [10, 25, 50, 100][CAST(CAST(substring(source, 4) AS INT) % 4 + 1 AS INT)] AS rate
         |  FROM documents
         |  WHERE ${saltedHashSql("mix", "doc_id")} % 100 <
         |    [10, 25, 50, 100][CAST(CAST(substring(source, 4) AS INT) % 4 + 1 AS INT)])
         |GROUP BY source""".stripMargin,

    "c4_decontam" ->
      s"""WITH tt AS (SELECT doc_id, $toks AS ws FROM documents),
         |g8 AS (SELECT DISTINCT doc_id, g FROM (
         |  SELECT doc_id, unnest([$gram8Sql for i in range(0, len(ws) - 7)]) AS g
         |  FROM tt)),
         |bench AS (SELECT DISTINCT g FROM g8 WHERE doc_id % 20 = 0),
         |cand AS (SELECT doc_id, g FROM g8 WHERE doc_id % 20 <> 0),
         |tot AS (SELECT doc_id, count(*) AS n_grams FROM cand GROUP BY 1),
         |hit AS (SELECT c.doc_id, count(*) AS n_shared
         |        FROM cand c JOIN bench b ON c.g = b.g GROUP BY 1)
         |SELECT tot.doc_id AS doc_id,
         |  CAST(n_grams AS BIGINT) AS n_grams,
         |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
         |  CAST(COALESCE(n_shared, 0) AS DOUBLE) / n_grams AS contamination,
         |  CAST(COALESCE(n_shared, 0) AS DOUBLE) / n_grams >= $ContamT AS flagged
         |FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id""".stripMargin
  )
}
