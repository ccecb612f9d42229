package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomMightContainLong: the no-false-negative contract (what makes
  * prune-then-verify EXACT), a bounded false-positive rate, and null
  * pass-through — probed through the normal codegen'd filter path. */
class BloomFunctionsSpec extends SparkSpec {

  test("no false negatives: every inserted key passes the probe") {
    import spark.implicits._
    val keys = (1L to 10000L).map(_ * 2654435761L) // spread bits
    val df = keys.toDF("k")
    val bloom = BloomFunctions.buildLongBloom(df, "k", keys.size.toLong)
    val kept = df.where(BloomFunctions.mightContain(bloom, col("k"))).count()
    assert(kept === keys.size.toLong)
  }

  test("false positives are rare at the built fpp") {
    import spark.implicits._
    val members = (1L to 10000L).toDF("k")
    val bloom = BloomFunctions.buildLongBloom(members, "k", 10000L, fpp = 0.001)
    // disjoint probe set
    val probes = (1000001L to 1100000L).toDF("k")
    val fps = probes.where(BloomFunctions.mightContain(bloom, col("k"))).count()
    assert(fps < 1000L, s"$fps false positives in 100k probes at fpp=1e-3")
  }

  test("null keys stay null (filter drops them, negation keeps nothing extra)") {
    import spark.implicits._
    val members = Seq(1L, 2L).toDF("k")
    val bloom = BloomFunctions.buildLongBloom(members, "k", 2L)
    val withNull = Seq(Some(1L), None, Some(99L)).toDF("k")
    val probe = BloomFunctions.mightContain(bloom, col("k"))
    assert(withNull.where(probe).count() === 1L)       // only the true member
    assert(withNull.where(!probe).select("k").collect().map(_.getLong(0)).toSet
      === Set(99L))                                    // null is neither
  }

  test("interpreted eval agrees with the codegen path") {
    import spark.implicits._
    val members = (1L to 500L).toDF("k")
    val bloom = BloomFunctions.buildLongBloom(members, "k", 500L)
    val probes = (1L to 2000L).toDF("k")
    val viaCodegen = probes.where(BloomFunctions.mightContain(bloom, col("k")))
      .collect().map(_.getLong(0)).toSet
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = probes.where(BloomFunctions.mightContain(bloom, col("k")))
        .collect().map(_.getLong(0)).toSet
      assert(interpreted === viaCodegen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
