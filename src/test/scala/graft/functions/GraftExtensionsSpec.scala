package graft.functions

import graft.SparkSpec

/** SQL-surface registration of the custom expressions. */
class GraftExtensionsSpec extends SparkSpec {

  test("registerAll exposes the functions to spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(CAST(1.0 AS DOUBLE), 2.0), array(CAST(3.0 AS DOUBLE), 4.0)) AS d,
        |  graft_polyhash('abc') AS h,
        |  size(graft_shingle_hashes('a b c d', 3)) AS ns,
        |  graft_lsh_bucket(array(CAST(1.0 AS FLOAT)), 8, 1) AS b,
        |  graft_sorted_term_sum(array(named_struct('g', 2L, 't', CAST(1.5 AS DOUBLE)),
        |                              named_struct('g', 1L, 't', CAST(2.5 AS DOUBLE)))) AS s,
        |  size(graft_minhash_sig(array(1L, 2L, 3L), 8)) AS nm,
        |  graft_l1(array(1L, 5L, 9L), array(3L, 5L, 2L)) AS l1
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    // h = ((('a'*31)+'b')*31+'c') % P computed the shared way
    val expected = PolyHash.hash("abc", graft.text.TextFunctions.HashP)
    assert(r.getLong(1) === expected)
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) >= 0 && r.getInt(3) < 256)
    assert(r.getDouble(4) === 4.0)
    assert(r.getInt(5) === 8)
    assert(r.getLong(6) === 9L)
  }

  test("graft_bloom_might_contain probes a binary-literal bloom from SQL") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val bloom = BloomFunctions.buildLongBloom(Seq(7L, 8L).toDF("k"), "k", 2L)
    val hex = bloom.map(b => f"$b%02x").mkString
    val hits = spark.sql(
      s"SELECT k FROM VALUES (7L), (8L), (999L) t(k) " +
        s"WHERE graft_bloom_might_contain(k, unhex('$hex'))")
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(7L, 8L))
  }

  test("extensions class injects the same builders") {
    // builder table is the single source for both registration paths
    assert(GraftFunctions.builders.map(_._1).toSet ===
      Set("graft_dot", "graft_l1", "graft_polyhash", "graft_shingle_hashes",
        "graft_lsh_bucket", "graft_sorted_term_sum", "graft_minhash_sig",
        "graft_bloom_might_contain", "graft_interleave_bits"))
  }
}
