package graft.multimodal

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf()))

  test("media table: schema, kinds, payload round-trip") {
    val rows = media.limit(10).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(m => Set("image", "audio", "video")(m.kind)))
    // payload is the UTF-8 text — deterministic, non-empty
    assert(rows.forall(_.payload.nonEmpty))
    val doc0 = Tables.documents(spark, sf()).where(col("doc_id") === 0)
      .select("text").collect().head.getString(0)
    val m0 = media.filter(_.media_id == 0).collect().head
    assert(new String(m0.payload, "UTF-8") === doc0)
  }

  test("feature extraction: histogram sums to byte count; deterministic") {
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.length === media.count())
    assert(f.forall(x => x.histogram16.sum === x.n_bytes))
    assert(f.forall(x => x.byte_mean > 0))
    val again = Multimodal.extractFeatures(media).collect()
    assert(f.map(_.byte_mean).sorted === again.map(_.byte_mean).sorted)
  }

  test("frame sampling: offsets follow stride; frames have exact length") {
    val frames = Multimodal.sampleFrames(media, stride = 32, frameLen = 16).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_bytes.length === 16))
    assert(frames.forall(f => f.offset_bytes === f.frame_idx * 32L))
  }

  test("resize bounds payload length") {
    val resized = Multimodal.resizeAll(media, target = 64).collect()
    assert(resized.forall(_.payload.length <= 64))
    // deterministic sampling: same input -> same bytes
    val twice = Multimodal.resizeAll(media, target = 64).collect()
    assert(resized.sortBy(_.media_id).zip(twice.sortBy(_.media_id))
      .forall { case (a, b) => java.util.Arrays.equals(a.payload, b.payload) })
  }

  test("metadata summary never reads payload (column pruning)") {
    val summary = Multimodal.metadataSummary(media)
    assert(summary.collect().map(_.getLong(2)).sum === media.count())
    // the analyzed plan of a metadata-only projection over the parquet-backed
    // documents scan must not require the text payload column once pruned
    val plan = Tables.documents(spark, sf()).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("text"))
  }
}
