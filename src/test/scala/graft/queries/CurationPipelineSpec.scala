package graft.queries

import graft.SparkSpec
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._

/** End-to-end composition: the library's operators chained the way a
  * training-data pipeline actually runs them — quality filter → exact dedup
  * → benchmark decontamination → deterministic sample → partitioned sink —
  * with the set-shrinkage and determinism invariants asserted at each stage.
  * Each stage is declarative, so the whole pipeline is ONE Catalyst plan
  * until the sink (no intermediate materialization required). */
class CurationPipelineSpec extends SparkSpec {

  test("filter → dedup → decontaminate → sample → write composes and shrinks") {
    val docs = Tables.documents(spark, sf())
    val n0 = docs.count()

    // 1. quality: keep docs passing the t3 score threshold
    val quality = TextQueries.defs("t3_quality")(spark, sf())
      .where(col("keep")).select("doc_id")
    val q = docs.join(quality, "doc_id")
    val n1 = q.count()
    assert(n1 <= n0 && n1 > 0)

    // 2. exact dedup: keep the min doc_id per identical text
    val dd = q.withColumn("keeper", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text")))
      .where(col("doc_id") === col("keeper")).drop("keeper")
    val n2 = dd.count()
    assert(n2 <= n1 && dd.select("text").distinct().count() === n2)

    // 3. decontamination: drop docs flagged against the benchmark slice
    val flagged = CurationQueries.defs("c4_decontam")(spark, sf())
      .where(col("flagged")).select("doc_id")
    val clean = dd.join(flagged, Seq("doc_id"), "left_anti")
    val n3 = clean.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. deterministic sample — same rows on every rerun
    val sampled = CurationQueries.hashSampled(clean)
    val once = sampled.collect().toSet
    assert(once === CurationQueries.hashSampled(clean).collect().toSet)
    assert(once.size <= n3)

    // 5. sink: partitioned by lang, read back identical
    val out = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    try {
      Sinks.writePartitionedParquet(sampled, out, "lang")
      val back = spark.read.parquet(out)
        .select("doc_id", "lang", "source", "n_chars")
      assert(back.collect().toSet ===
        sampled.select("doc_id", "lang", "source", "n_chars").collect().toSet)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }
}
