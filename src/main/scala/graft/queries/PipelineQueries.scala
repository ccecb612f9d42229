package graft.queries

import graft.Checkpoints.EagerOps
import graft.sources.Tables
import graft.text.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * p1: the COMPOSED curation pipeline — the artifact a training run actually
 * consumes, built by chaining the per-stage operators the gate already
 * proves individually into ONE dataflow:
 *
 *   c1 hash-sample → c7 bloom decontam → t12 LM-quality gate →
 *   d3 near-dup admission → c3 mixture → c6 shard-pack
 *
 * Each stage runs on the SURVIVOR set of the previous one — the real
 * pipeline semantics (the quality LM is trained on the post-decontam
 * corpus, near-dup pairs are generated among quality survivors, …), which
 * per-stage gates structurally cannot cover: stage composition is exactly
 * where column contracts, double filtering, and order sensitivity break.
 *
 * Output: ONE row per corpus document — (doc_id, kept_reason, shard) —
 * where kept_reason is a stage bitmap (bit set = the doc reached the stage
 * and passed it; a doc dropped at stage k has all later bits 0, so the
 * bitmap is monotone) and shard is the c6 pack assignment for fully-kept
 * docs (NULL otherwise). A training job reads `kept_reason = 31`; an audit
 * reads the bitmap histogram.
 *
 * 100 TB notes: the base corpus is checkpointed ONCE and every stage
 * derives from it — one parquet scan feeds the whole chain (PlanSpec pins
 * the final plan re-reads no parquet). All five projected columns are
 * consumed downstream (text→grams/LM, lang→thresholds, source→mixture,
 * n_chars→shards), so the single-scan shape loses nothing to column
 * pruning. Per stage the scale shapes are inherited from the proven
 * operators: the bench gram set blooms map-side (c7), per-lang thresholds
 * broadcast (t12 — swap in [[TextQueries.lmThresholdsApprox]] at scale),
 * banding bounds the candidate join (d3), the shard pack is the c6
 * distributed prefix sum. The verdict assembly left-joins five SHRINKING
 * doc_id sets keyed by doc_id — O(sample) rows each after stage 1.
 */
object PipelineQueries {

  /** kept_reason bits, in stage order. */
  val BitSampled = 1
  val BitDecontam = 2
  val BitQuality = 4
  val BitNearDup = 8
  val BitMixture = 16
  /** All stages passed — the trained-on set. */
  val KeptAll: Int = BitSampled | BitDecontam | BitQuality | BitNearDup | BitMixture

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_pipeline" -> ((s, d) => pipelineOf(docs(s, d)))
  )

  /** The composed pipeline on any (doc_id, lang, source, n_chars, text)
    * frame (parametric for fixture specs). */
  private[queries] def pipelineOf(documents0: DataFrame): DataFrame = {
    val documents = documents0
      .select("doc_id", "lang", "source", "n_chars", "text")
      .eagerCheckpoint() // the ONE corpus materialization the chain reads
    val B = graft.functions.BloomFunctions
    def g8(df: DataFrame) = df.select(col("doc_id"),
      explode(graft.functions.VectorFunctions.shingleHashes(col("text"), 8, HashP)).as("g"))

    // stage 1 — c1: deterministic 10% hash sample (pure row-local filter)
    val s1 = documents.where(CurationQueries.samplePred).eagerCheckpoint()

    // stage 2 — c7: benchmark decontamination. The bench slice (held-out
    // suite stand-in, doc_id % 20 == 0) comes from the FULL corpus — the
    // benchmark is external to the sample — and bench members themselves
    // are never training data. Bloom prune map-side, exact verify join.
    val bench = g8(documents.where(col("doc_id") % 20 === 0)).select("g").distinct()
    val bloom = B.buildLongBloom(bench, "g", bench.count(), fpp = 1e-3)
    val hit = g8(s1.where(col("doc_id") % 20 =!= 0))
      .where(B.mightContain(bloom, col("g")))
      .join(bench, "g").select("doc_id").distinct()
    val s2 = s1.where(col("doc_id") % 20 =!= 0)
      .join(hit, Seq("doc_id"), "left_anti")
      .eagerCheckpoint() // feeds the LM build twice + the lang join

    // stage 3 — t12: LM-quality gate, model TRAINED ON THE SURVIVORS (the
    // published recipe scores against the corpus being curated, not some
    // fixed external corpus), per-lang 30th-percentile cut.
    val scored = TextQueries.bigramLmScoresOf(s2)
    val sl = scored.join(s2.select("doc_id", "lang"), "doc_id")
    val th = sl.groupBy("lang").agg(expr("percentile(avg_p, 0.3)").as("p30"))
    val passQ = sl.join(broadcast(th), "lang")
      .where(col("avg_p") >= col("p30")).select("doc_id")
    val s3 = s2.join(passQ, Seq("doc_id")).eagerCheckpoint() // feeds shingles + 3 verdict joins

    // stage 4 — d3: near-dup admission among quality survivors. Banding
    // proposes, exact Jaccard verifies; the pair's min doc_id is kept
    // (d10's per-pair keep-rule family — admission, not clustering).
    val rejected = DedupQueries.minhashLshOf(DedupQueries.shingleSetsOf(s3))
      .select(col("doc_b").as("doc_id")).distinct()
    val s4 = s3.join(rejected, Seq("doc_id"), "left_anti")

    // stage 5 — c3: mixture keep-rates by source (row-local filter)
    val s5 = s4.where(CurationQueries.mixPred).eagerCheckpoint() // feeds pack + verdict

    // stage 6 — c6: shard-pack the final kept set (distributed prefix sum)
    val packed = CurationQueries.shardPackOf(s5, CurationQueries.ShardBudget)
      .select(col("doc_id"), col("shard"))

    // verdict: one row per corpus doc, monotone stage bitmap + shard
    def flag(ids: DataFrame, name: String) =
      ids.select(col("doc_id")).withColumn(name, lit(true))
    def bit(name: String, v: Int) = when(col(name), v).otherwise(0)
    documents.select("doc_id")
      .join(flag(s1, "b1"), Seq("doc_id"), "left")
      .join(flag(s2, "b2"), Seq("doc_id"), "left")
      .join(flag(s3, "b3"), Seq("doc_id"), "left")
      .join(flag(s4, "b4"), Seq("doc_id"), "left")
      .join(flag(s5, "b5"), Seq("doc_id"), "left")
      .join(packed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (bit("b1", BitSampled) + bit("b2", BitDecontam) + bit("b3", BitQuality) +
          bit("b4", BitNearDup) + bit("b5", BitMixture)).cast("int").as("kept_reason"),
        col("shard"))
  }

  /** The whole chain as one DuckDB WITH cascade — every stage CTE is the
    * SAME formula family its per-stage oracle proves (c1/c7/t9+t12/d3/c3/c6),
    * re-anchored to the previous stage's survivor set. */
  val oracles: Map[String, String] = {
    val toks = tokensSql("text")
    val gram8 = CurationQueries.gram8Sql
    import DedupQueries.{JaccardT, ShingleK}
    Map(
      "p1_pipeline" ->
        s"""WITH s1 AS (
           |  SELECT doc_id, lang, source, n_chars, text FROM documents
           |  WHERE ${CurationQueries.saltedHashSql("smpl", "doc_id")} % 100 < 10),
           |bw AS (SELECT doc_id, $toks AS ws FROM documents WHERE doc_id % 20 = 0),
           |bench AS (SELECT DISTINCT g FROM (
           |  SELECT unnest([$gram8 for i in range(0, len(ws) - 7)]) AS g FROM bw)),
           |cw AS (SELECT doc_id, $toks AS ws FROM s1 WHERE doc_id % 20 <> 0),
           |hit AS (SELECT DISTINCT doc_id FROM (
           |    SELECT doc_id, unnest([$gram8 for i in range(0, len(ws) - 7)]) AS g FROM cw) cg
           |  JOIN bench USING (g)),
           |s2 AS (SELECT * FROM s1 WHERE doc_id % 20 <> 0
           |       AND doc_id NOT IN (SELECT doc_id FROM hit)),
           |tt AS (SELECT doc_id, $toks AS ws FROM s2),
           |inst AS (
           |  SELECT doc_id,
           |    unnest([${polyHashSql("ws[i+1] || ' ' || ws[i+2]")}
           |            for i in range(0, len(ws) - 1)]) AS g,
           |    unnest([${polyHashSql("ws[i+1]")}
           |            for i in range(0, len(ws) - 1)]) AS pg
           |  FROM tt WHERE len(ws) >= 2),
           |cnt AS (SELECT g, COUNT(*)::BIGINT AS c FROM inst GROUP BY g),
           |pre AS (SELECT pg, COUNT(*)::BIGINT AS c1 FROM inst GROUP BY pg),
           |p AS (SELECT doc_id, inst.g AS g,
           |        CAST(c AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
           |      FROM inst JOIN cnt ON inst.g = cnt.g
           |                JOIN pre ON inst.pg = pre.pg),
           |score AS (
           |  SELECT doc_id,
           |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY g, p)),
           |      (a, x) -> a + x) / COUNT(*) AS avg_p
           |  FROM p GROUP BY doc_id),
           |sl AS (SELECT s.doc_id, d.lang, s.avg_p FROM score s JOIN s2 d USING (doc_id)),
           |th AS (SELECT lang, quantile_cont(avg_p, 0.3) AS p30 FROM sl GROUP BY lang),
           |passq AS (SELECT sl.doc_id FROM sl JOIN th USING (lang) WHERE sl.avg_p >= th.p30),
           |s3 AS (SELECT s2.* FROM s2 JOIN passq USING (doc_id)),
           |sgl AS (
           |  SELECT doc_id,
           |    CASE WHEN len(t) >= $ShingleK THEN list_distinct(list_transform(
           |      [array_to_string(t[i+1:i+$ShingleK], ' ') for i in range(0, len(t) - ${ShingleK - 1})],
           |      x -> ${polyHashSql("x")}))
           |    ELSE [] END AS sh
           |  FROM (SELECT doc_id, $toks AS t FROM s3)),
           |shf AS (SELECT doc_id, sh FROM sgl WHERE len(sh) > 0),
           |sig AS (SELECT doc_id, sh, ${minhashSignatureSql("sh")} AS sig FROM shf),
           |bands AS (
           |  SELECT doc_id,
           |         CAST(band AS VARCHAR) || ':' ||
           |           array_to_string(sig[band*$RowsPerBand+1 : band*$RowsPerBand+$RowsPerBand], '-') AS bkey
           |  FROM sig, range($NumBands) r(band)),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
           |rej AS (SELECT DISTINCT doc_b AS doc_id FROM (
           |    SELECT doc_a, doc_b,
           |           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
           |             (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
           |    FROM cand
           |    JOIN shf sa ON sa.doc_id = cand.doc_a
           |    JOIN shf sb ON sb.doc_id = cand.doc_b)
           |  WHERE jaccard >= $JaccardT),
           |s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM rej)),
           |s5 AS (SELECT * FROM s4
           |  WHERE ${CurationQueries.saltedHashSql("mix", "doc_id")} % 100 <
           |    [10, 25, 50, 100][CAST(CAST(substring(source, 4) AS INT) % 4 + 1 AS INT)]),
           |h AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           |        ${CurationQueries.saltedHashSql("shard", "doc_id")} AS k FROM s5),
           |packed AS (SELECT doc_id,
           |  CAST(COALESCE(SUM(n_chars) OVER (ORDER BY k, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           |    // ${CurationQueries.ShardBudget} AS shard FROM h)
           |SELECT d.doc_id,
           |  CAST(CASE WHEN b1.doc_id IS NOT NULL THEN $BitSampled ELSE 0 END
           |     + CASE WHEN b2.doc_id IS NOT NULL THEN $BitDecontam ELSE 0 END
           |     + CASE WHEN b3.doc_id IS NOT NULL THEN $BitQuality ELSE 0 END
           |     + CASE WHEN b4.doc_id IS NOT NULL THEN $BitNearDup ELSE 0 END
           |     + CASE WHEN b5.doc_id IS NOT NULL THEN $BitMixture ELSE 0 END AS INT) AS kept_reason,
           |  packed.shard AS shard
           |FROM documents d
           |LEFT JOIN (SELECT doc_id FROM s1) b1 ON d.doc_id = b1.doc_id
           |LEFT JOIN (SELECT doc_id FROM s2) b2 ON d.doc_id = b2.doc_id
           |LEFT JOIN (SELECT doc_id FROM s3) b3 ON d.doc_id = b3.doc_id
           |LEFT JOIN (SELECT doc_id FROM s4) b4 ON d.doc_id = b4.doc_id
           |LEFT JOIN (SELECT doc_id FROM s5) b5 ON d.doc_id = b5.doc_id
           |LEFT JOIN packed ON d.doc_id = packed.doc_id""".stripMargin
    )
  }
}
