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
        |  graft_lsh_bucket(array(CAST(1.0 AS FLOAT)), 8, 1) AS b
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    // h = ((('a'*31)+'b')*31+'c') % P computed the shared way
    val expected = PolyHash.hash("abc", graft.text.TextFunctions.HashP)
    assert(r.getLong(1) === expected)
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) >= 0 && r.getInt(3) < 256)
  }

  test("extensions class injects the same builders") {
    // builder table is the single source for both registration paths
    assert(GraftFunctions.builders.map(_._1).toSet ===
      Set("graft_dot", "graft_polyhash", "graft_shingle_hashes", "graft_lsh_bucket"))
  }
}
