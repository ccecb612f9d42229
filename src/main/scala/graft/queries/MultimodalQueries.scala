package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Oracle-checkable slice of the multimodal family ([[graft.multimodal]]):
 * binary payload construction + metadata derivation as pure column
 * expressions (the codec-dependent operators are spec-tested instead — the
 * fake decode is not SQL).
 */
object MultimodalQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload metadata: byte length + hex head fingerprint.
    "m1_binary_meta" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        lower(substring(hex(encode(col("text"), "UTF-8")), 1, 16)).as("head_hex"))),

    // Typed media metadata derived per kind (round-robin assignment — the
    // mediaFromDocuments mapping, column-expressible subset).
    "m2_media_kinds" -> ((s, d) =>
      docs(s, d).select(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        when(col("doc_id") % 3 =!= 0, col("n_chars") * 10).otherwise(0L).as("duration_ms"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), max("duration_ms").as("max_duration_ms")))
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  lower(substring(hex(encode(text)), 1, 16)) AS head_hex
        |FROM documents""".stripMargin,

    "m2_media_kinds" ->
      """SELECT kind, COUNT(*) AS n, MAX(duration_ms) AS max_duration_ms
        |FROM (
        |  SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |         CASE WHEN doc_id % 3 <> 0 THEN n_chars * 10 ELSE 0 END AS duration_ms
        |  FROM documents)
        |GROUP BY kind""".stripMargin
  )
}
