package graft.ccf

import graft.SparkSpec

/** Reference-parity of the experiment harness: iteration counts on the
  * deterministic chain family must equal the reference CSV row for row
  * (BASELINE.md experiment 2, experiment_results_scala.csv:14-23); structural
  * invariants must hold for the seeded families. Chain n=200/500 run in the
  * harness itself (Experiments.runAll) but are too slow for every test run —
  * n<=100 here mirrors CCFSpec's coverage with the harness code path. */
class ExperimentsSpec extends SparkSpec {

  test("chain iteration counts match the reference CSV via the harness path") {
    val expected = Map(10 -> 6, 50 -> 8, 100 -> 9)
    for ((n, iters) <- expected) {
      val r = CCF.run(Generators.toDF(spark, Generators.chainGraph(n)))
      assert(r.iterations === iters, s"chain n=$n")
    }
  }

  test("cluster invariants through the harness result shape") {
    val edges = Generators.clusterGraph(5, 20, 0)
    val df = Generators.toDF(spark, edges)
    val r = CCF.run(df)
    assert(CCF.componentCount(r.assignments) === 5L)
    // bridges merge components
    val bridged = Generators.clusterGraph(5, 20, 4)
    val r2 = CCF.run(Generators.toDF(spark, bridged))
    assert(CCF.componentCount(r2.assignments) < 5L)
  }

  test("seeded families reproduce the reference CSV's iterations + components row for row") {
    // parse the reference's own results (read-only fixture) and check one
    // config per family — including the RNG-dependent ones, which only match
    // because Generators reproduces the reference's scala.util.Random stream
    val refCsv = java.nio.file.Paths.get("/root/reference/experiment_results_scala.csv")
    assume(java.nio.file.Files.exists(refCsv))
    val rows = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(refCsv)).asScala.drop(1)
      .map(_.split(",")).map(f => (f(0), f(1).toInt, f(8).toInt, f(3), f(4).toInt, f(6).toInt))
    def ref(exp: String, nodes: Int, inter: Int): (Int, Int) =
      rows.collectFirst {
        case (e, n, ie, a, it, comps)
          if e == exp && n == nodes && ie == inter && a == "Basic" => (it, comps)
      }.get

    val cases = Seq(
      ("random_graph", Generators.randomGraph(2000, 6000), 2000, 0),
      ("cluster_graph", Generators.clusterGraph(10, 50, 9), 500, 9),
      ("cluster_graph", Generators.clusterGraph(20, 50, 19), 1000, 19))
    for ((exp, graph, nodes, inter) <- cases) {
      val r = CCF.run(Generators.toDF(spark, graph))
      val comps = CCF.componentCount(r.assignments).toInt
      val (refIters, refComps) = ref(exp, nodes, inter)
      assert((r.iterations, comps) === ((refIters, refComps)), s"$exp n=$nodes inter=$inter")
    }
  }

  test("results CSV has the reference's 9-column shape") {
    val row = Experiments.Result("chain", 10, 9, "basic", 6, 0.1, 1, 0, 0)
    val csv = Experiments.toCsv(Seq(row))
    val lines = csv.split("\n")
    assert(lines.head.split(",").length === 9)
    assert(lines(1).startsWith("chain,10,9,basic,6,"))
  }
}
