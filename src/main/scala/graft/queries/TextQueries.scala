package graft.queries

import graft.sources.Tables
import graft.text.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over the `documents` table (driver north-star:
 * token counting, quality scoring, language-ID heuristic, document
 * fingerprinting). All per-row scalar pipelines — no shuffle except the
 * word-frequency rollup — built on codegen'd higher-order functions, no UDFs.
 *
 * Oracle-parity: ratios are single IEEE divisions of exact integers
 * (identical bits both engines); hashes are the shared fold from
 * [[graft.text.TextFunctions]].
 */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, distinct tokens, mean token length.
    "t1_token_stats" -> ((s, d) => {
      val t = tokens(col("text"))
      docs(s, d).select(
        col("doc_id"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        length(col("text")).as("n_chars_actual"),
        (aggregate(transform(t, w => length(w).cast("long")), lit(0L), (a, x) => a + x)
          .cast("double") / size(t)).as("avg_token_len"))
    }),

    // Corpus word frequency: top 50 words, total order (count desc, word asc).
    "t2_word_freq" -> ((s, d) =>
      docs(s, d)
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(50)),

    // Quality scoring: type-token ratio + stopword ratio -> score + keep flag.
    "t3_quality" -> ((s, d) => {
      val t = tokens(col("text"))
      val n = size(t)
      val nStop = size(filter(t, w => w.isInCollection(Stopwords)))
      val ttr = size(array_distinct(t)).cast("double") / n
      val stopRatio = nStop.cast("double") / n
      docs(s, d).select(
        col("doc_id"),
        ttr.as("ttr"),
        stopRatio.as("stopword_ratio"),
        (ttr * 0.5 + (lit(1.0) - stopRatio) * 0.5).as("quality_score"),
        (ttr * 0.5 + (lit(1.0) - stopRatio) * 0.5 >= 0.6).as("keep"))
    }),

    // Language-ID heuristic: English-stopword hit ratio (n-gram/stopword
    // heuristic family; the synthetic corpus is English-vocab so the signal
    // is the ratio itself, thresholded).
    "t4_lang_guess" -> ((s, d) => {
      val t = tokens(col("text"))
      val ratio = size(filter(t, w => w.isInCollection(Stopwords))).cast("double") / size(t)
      docs(s, d).select(
        col("doc_id"),
        col("lang").as("lang_declared"),
        ratio.as("en_stopword_ratio"),
        when(ratio >= 0.05, "en").otherwise("und").as("lang_guess"))
    }),

    // Document fingerprinting: order-sensitive rolling hash of the full text
    // + order-insensitive bag fingerprint (sorted distinct tokens).
    "t5_fingerprint" -> ((s, d) => {
      val t = tokens(col("text"))
      docs(s, d).select(
        col("doc_id"),
        polyHash(col("text")).as("content_hash"),
        polyHash(array_join(array_sort(array_distinct(t)), " ")).as("bag_hash"))
    })
  )

  private val toks = tokensSql("text")

  val oracles: Map[String, String] = Map(
    "t1_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($toks) AS INT) AS n_tokens,
         |  CAST(len(list_distinct($toks)) AS INT) AS n_distinct,
         |  CAST(length(text) AS INT) AS n_chars_actual,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform($toks, w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS DOUBLE)
         |    / len($toks) AS avg_token_len
         |FROM documents""".stripMargin,

    "t2_word_freq" ->
      s"""SELECT word, COUNT(*) AS n
         |FROM (SELECT unnest($toks) AS word FROM documents)
         |GROUP BY word ORDER BY n DESC, word ASC LIMIT 50""".stripMargin,

    "t3_quality" ->
      s"""SELECT doc_id, ttr, stopword_ratio,
         |  ttr * 0.5 + (1.0 - stopword_ratio) * 0.5 AS quality_score,
         |  ttr * 0.5 + (1.0 - stopword_ratio) * 0.5 >= 0.6 AS keep
         |FROM (
         |  SELECT doc_id,
         |    CAST(len(list_distinct($toks)) AS DOUBLE) / len($toks) AS ttr,
         |    CAST(len(list_filter($toks, w -> list_contains($stopwordsSqlList, w))) AS DOUBLE)
         |      / len($toks) AS stopword_ratio
         |  FROM documents)""".stripMargin,

    "t4_lang_guess" ->
      s"""SELECT doc_id, lang AS lang_declared, r AS en_stopword_ratio,
         |  CASE WHEN r >= 0.05 THEN 'en' ELSE 'und' END AS lang_guess
         |FROM (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter($toks, w -> list_contains($stopwordsSqlList, w))) AS DOUBLE)
         |      / len($toks) AS r
         |  FROM documents)""".stripMargin,

    "t5_fingerprint" ->
      s"""SELECT doc_id,
         |  ${polyHashSql("text")} AS content_hash,
         |  ${polyHashSql(s"array_to_string(list_sort(list_distinct($toks)), ' ')")} AS bag_hash
         |FROM documents""".stripMargin
  )
}
