package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: (sfDir, outDir); optional 3rd arg = comma-separated
    // query-name filter for local iteration with scripts/compare.py
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark 4.1 false-positive: any join -> rollup trips
      // DetectAmbiguousSelfJoin even with no self join (q8_rollup)
      // events.ts is TIMESTAMP(NANOS): read as Long, converted in Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-key outcome, recorded for manifest.json below: the round's
    // correctness artifact must be self-evidencing — an empty or truncated
    // downstream compare is then attributable (harness fault vs code fault)
    // from the repo's own artifacts instead of indistinguishable from
    // "never ran".
    val statuses = scala.collection.mutable.LinkedHashMap.empty[String, (String, Long)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // read-back count: cheap on the single just-written result file,
        // and it evidences the parquet is actually readable end-to-end
        statuses(name) = ("written", spark.read.parquet(s"$outDir/$name").count())
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        statuses(name) = ("failed", -1L)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // filtered runs write a FILTERED oracle map: manifest and oracle must
    // describe the same key set, or compare.py's truncation guard would
    // refuse a perfectly healthy filtered dump as "artifacts disagree"
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest.json: per-key status + totals, written LAST so its presence
    // also evidences the run completed. compare.py refuses an oracle map
    // that is empty or whose key set mismatches this manifest — turning a
    // silently-empty correctness artifact into a loud, attributable error.
    val keyJson = statuses.map { case (k, (s, n)) =>
      s"${q(k)}: {${q("status")}: ${q(s)}, ${q("rows")}: $n}"
    }.mkString("{", ",", "}")
    val manifest =
      s"""{${q("total_queries")}: ${statuses.size}, ${q("written")}: ${
        statuses.count(_._2._1 == "written")}, ${q("failed")}: [${
        statuses.collect { case (k, ("failed", _)) => q(k) }.mkString(",")
      }], ${q("oracle_keys")}: ${
        SparkEntry.oracleSql.count { case (k, _) => only.forall(_.contains(k)) }
      }, ${q("keys")}: $keyJson}"""
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    spark.stop()
  }
}
