package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sketch contracts: approximations within their stated error bounds of the
  * exact answers (the bound IS the sketch's correctness statement). */
class SketchesSpec extends SparkSpec {

  test("approx component count within 5% of the exact O10 distinct count") {
    val edges = graft.graph.GraphBuilders.copurchaseEdges(spark, sf())
    val asgn = graft.ccf.CCF.run(edges).assignments
    val exact = graft.ccf.CCF.componentCount(asgn)
    val approx = Sketches.approxComponentCount(asgn, rsd = 0.02)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"exact=$exact approx=$approx err=$err")
  }

  test("per-group approx distinct tracks exact across orders priorities") {
    val o = Tables.orders(spark, sf())
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = o.groupBy("o_orderpriority")
      .agg(Sketches.approxDistinctAgg(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: exact=$e approx=$a")
    }
  }

  test("approx quantiles within 1% rank error of exact percentiles") {
    val l = Tables.lineitem(spark, sf()).select(col("l_extendedprice").cast("double").as("x"))
    val n = l.count()
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val approx = Sketches.approxQuantiles(l, "x", qs)
    // rank check: the fraction of values below each reported quantile must be
    // within 1% (plus sketch accuracy slack) of the requested q
    for ((q, v) <- qs.zip(approx)) {
      val rank = l.where(col("x") <= v).count().toDouble / n
      assert(math.abs(rank - q) <= 0.011, s"q=$q value=$v achievedRank=$rank")
    }
  }
}
