package graft.ccf

import graft.SparkSpec

import scala.util.Random

/** Property check (SURVEY.md §5.2): CCF output equals a driver-side
  * union-find oracle on seeded random graphs. Runs a bounded set of seeds
  * rather than an open-ended ScalaCheck forAll — each case spins Spark jobs,
  * so we trade generator breadth for suite runtime. */
class CCFPropertySpec extends SparkSpec {

  /** Minimal union-find computing, per node, the LEXICOGRAPHIC-min member of
    * its component (matching CCF's string semantics). */
  private def unionFindLabels(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  for (seed <- Seq(1, 7, 13, 42, 99)) {
    test(s"ccf == union-find on random graph, seed=$seed") {
      val rng = new Random(seed)
      val n = 20 + rng.nextInt(60)
      val m = n + rng.nextInt(2 * n)
      val edges = Seq.fill(m) {
        (rng.nextInt(n).toString, rng.nextInt(n).toString)
      }.filter { case (a, b) => a != b }

      val expected = unionFindLabels(edges)
        .collect { case (node, root) if node != root => (node, root) }.toSet

      val r = CCF.run(Generators.toDF(spark, edges))
      val got = r.assignments.collect().map(x => (x.getString(0), x.getString(1))).toSet
      assert(got === expected)
      assert(r.converged)
      // labels only decrease: every label is <= its node (strictly, since
      // representatives emit no row)
      assert(got.forall { case (node, comp) => comp < node })
    }
  }

  for (seed <- Seq(3, 21)) {
    test(s"auto == union-find regardless of routing, seed=$seed") {
      // density varies with the draw (m up to ~3n on few nodes can cross the
      // dense threshold), so this stochastically covers both the CCF and the
      // straight-to-PointerJump routes of the auto engine — the answer must
      // be routing-invariant.
      val rng = new Random(seed)
      val n = 10 + rng.nextInt(40)
      val m = n + rng.nextInt(5 * n)
      val edges = Seq.fill(m) {
        (rng.nextInt(n).toString, rng.nextInt(n).toString)
      }.filter { case (a, b) => a != b }
      val expected = unionFindLabels(edges)
        .collect { case (node, root) if node != root => (node, root) }.toSet
      val r = CCF.auto(Generators.toDF(spark, edges))
      val got = r.assignments.collect().map(x => (x.getString(0), x.getString(1))).toSet
      assert(got === expected, s"engine=${r.engine}")
      assert(r.converged)
    }
  }
}
