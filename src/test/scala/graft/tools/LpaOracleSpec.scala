package graft.tools

import graft.SparkSpec
import graft.queries.GraphQueries

/** The driver-side LPA oracle must agree with the distributed engine at
  * spec scale — the agreement that licenses it as the sf1 rehearsal gate
  * for g3_label_propagation, where the unrolled DuckDB oracle OOMs. */
class LpaOracleSpec extends SparkSpec {

  test("oracle labels == hand-simulated bridged-cliques fixture") {
    // same fixture as the g3 QueriesSpec test: cliques {1,2,3}/{10,11,12},
    // bridge 3-10; ids are already dense 0-based here to exercise `labels`
    // directly: nodes 0,1,2 clique A; 3,4,5 clique B; bridge 2-3
    val und = Array((0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3))
    val a = und.map(_._1) ++ und.map(_._2)
    val b = und.map(_._2) ++ und.map(_._1)
    val lbl = LpaOracle.labels(a, b, 6, 3)
    assert(lbl.toSeq === Seq(0, 0, 0, 2, 2, 2))
  }

  test("oracle == gated g3 on the co-purchase graph") {
    val bi = graft.ccf.CCF.bidirect(
      graft.graph.GraphBuilders.copurchaseEdges(spark, sf()))
    val pairs = bi.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val lbl = LpaOracle.labels(pairs.map(p => idx(p._1)), pairs.map(p => idx(p._2)),
      ids.length, GraphQueries.LpaIters)
    val expect = ids.indices.map(i => ids(i) -> ids(lbl(i))).toMap
    val engine = GraphQueries.defs("g3_label_propagation")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(engine === expect)
    assert(engine.nonEmpty)
  }
}
