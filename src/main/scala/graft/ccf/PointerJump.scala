package graft.ccf

import graft.Checkpoints.EagerOps
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Pointer-jumping connected components — the long-diameter complement to
 * [[CCF]], outside the reference's surface (SURVEY.md §2c; VERDICT r02 gap #3).
 *
 * CCF rewrites the EDGE SET each round: on long-diameter graphs the
 * intermediate pair set doubles per round until stars collapse, peaking near
 * n x 2^rounds (`CCF` scaladoc caveat — a 20k-node path peaks at ~40M pairs).
 * This variant instead keeps the topology STATIC and iterates a per-node
 * LABEL TABLE (exactly n rows, forever):
 *
 *   init       lab(u) = min(u, min neighbors(u))
 *   per round  lab'(u) = min over t in N(u) ∪ {lab(u), u} of lab(t)
 *              -- neighbor-min AND the pointer jump lab(lab(u)), one join
 *   stop when no label changed (observed metric, same one-job-per-round
 *   shape as CCF.run).
 *
 * Neighbor-min alone is hash-to-min (O(diameter) rounds); the lab(lab(u))
 * term is path-halving — it doubles the effective propagation distance per
 * round, giving O(log d)-ish convergence with per-round work bounded by
 * O(|E| + |V|) — no intermediate blowup, the standard trade (pointer
 * jumping, cf. the "Connected Components in MapReduce and Beyond" family).
 * The price vs CCF: a per-round join of the label table against the static
 * bidirected edge set, which CCF's self-rewriting pair set avoids on
 * SHORT-diameter graphs. Use CCF for web/social-shaped graphs, this for
 * paths/meshes/grid-shaped ones.
 *
 * Semantics match [[CCF.run]] exactly: any orderable key type, lexicographic
 * minima for strings, representative has no output row. Fixpoint correctness:
 * labels only decrease and stay within the component; at a fixpoint the
 * neighbor-min condition forces lab constant across every edge, and the
 * component minimum m keeps lab(m) = m throughout, so the constant is m.
 *
 * NOT thread-safe per session (same contract as [[CCF.run]]): the fixpoint
 * scopes shuffle-partition / AQE / codegen settings on the session for the
 * loop's duration; run concurrent fixpoints on separate sessions
 * (`spark.newSession()`).
 *
 * 100 TB notes: both joins hash-partition by node id; the label table is
 * n rows regardless of round; the static bidirected edge set is checkpointed
 * once and re-read each round (on a cluster: reliable-checkpoint / cache it).
 * newPairsHistory reports the per-round CHANGED-LABEL count (this algorithm
 * has no NewPair notion; the count is 0 exactly at convergence, same
 * contract).
 */
object PointerJump {

  /** Label tables up to this many nodes are BROADCAST into each round
    * (r18, the g2/g3 move — guide §2.4/§3.1): with the static bidirected
    * topology hash-partitioned by src once at build, a round is then
    * [broadcast-join labels → groupBy src] + [broadcast-join the n-row jump
    * table] — ZERO exchanges (plan-pinned in PlanSpec) instead of
    * re-shuffling the full edge stream every round. 8M nodes × ~16 B/row
    * ≈ 128 MB per round, the same bound and rationale as g2's rank table;
    * past it the rounds keep the shuffled-join shape. */
  private[ccf] val MaxBroadcastNodes = 8L * 1000 * 1000
  private[ccf] val MaxBroadcastNodesKey = "spark.graft.pj.maxBroadcastNodes"

  /** One broadcast-label round (r18): lab'(u) = least(lab(u), lab(lab(u)),
    * min over N(u) of lab(t)) — the same update as the shuffled
    * unioned-targets join, split into its neighbor-min and jump terms so
    * the edge stream never shuffles: nm rides `biRounds`' src partitioning
    * (zero exchanges when the build repartitioned by src — plan-pinned in
    * PlanSpec), and both the lab(u) and lab(lab(u)) terms are row-local
    * broadcast lookups INTO the same n-row label table. Inner joins stay
    * total: every node appears as src in the bidirected frame, and every
    * lab is a node id.
    *
    * r19 (ADVICE r18): the round previously also broadcast a JOINED n-row
    * "jumped" table — a distributed pre-job plus an extra n-row driver
    * collect+broadcast every round, several hundred MB through the driver
    * near the 8M-node bound. Now the only broadcast payload per round is
    * the label table itself (three renamed projections of `lt`; the jump
    * is a second lookup, not a second table), and lab(u) is read from the
    * same lookup — identical update values. Driver-memory sizing note: one
    * n-row table per round still transits the driver; the
    * [[MaxBroadcastNodesKey]] bound (~128 MB at 8M nodes) is sized for
    * that, so a conf override inherits this warning. */
  private[graft] def bcastRound(biRounds: DataFrame, lt: DataFrame): DataFrame = {
    val nm = biRounds.join(broadcast(lt), col("dst") === col("_t"))
      .groupBy(col("src")).agg(min(col("_tl")).as("nm"))
    val lt1 = lt.select(col("_t").as("_t1"), col("_tl").as("_tl1"))
    val lt2 = lt.select(col("_t").as("_t2"), col("_tl").as("_tl2"))
    nm.join(broadcast(lt1), col("src") === col("_t1")) // _tl1 = lab(u)
      .join(broadcast(lt2), col("_tl1") === col("_t2")) // _tl2 = lab(lab(u))
      .select(col("src").as("node"), col("_tl1").as("lab"),
        least(col("_tl1"), col("_tl2"), col("nm")).as("newlab"))
  }

  def run(edges: DataFrame, maxIterations: Int = 100): CCF.CCFResult = {
    require(edges.columns.length == 2, s"edge list must have 2 columns, got ${edges.columns.length}")
    val spark = edges.sparkSession

    // Static topology: canonical bidirected distinct edges, materialized once.
    // withStats: reset each checkpoint's carried-over Statistics to observed
    // truth — estimates otherwise compound (square) through the per-round
    // joins until planning drowns in BigInteger arithmetic (Bridge.withStats).
    val inObs = Observation()
    val bi0 = CCF.bidirect(edges.toDF("src", "dst")).distinct()
      .observe(inObs, count(lit(1)).as("n"))
      .eagerCheckpoint()
    // bounded-wait metric reads throughout (VERDICT r06 #2): raw
    // Observation.get hangs forever if metric delivery ever breaks;
    // CCF.observedOrCount falls back loudly to counting the checkpoint.
    val nBi = CCF.observedOrCount(inObs, "pj bidirect")(Map("n" -> bi0.count()))("n")
    val bi = org.apache.spark.sql.graft.Bridge.withStats(bi0, nBi)

    // Same toy-input tuning as CCF.run: sub-100k-pair fixpoints are
    // latency-bound — AQE's per-stage re-planning and codegen compile-cache
    // lookups dominate sub-second rounds (measured: 1.7 s/round with AQE on
    // vs ~0.2 s without, at n=5k). Scale-path defaults stay on otherwise.
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val codegenKey = "spark.sql.codegen.wholeStage"
    val origShuffle = spark.conf.get(shuffleKey)
    val origAqe = spark.conf.get(aqeKey)
    val origCodegen = spark.conf.get(codegenKey)
    val sized = math.max(1L, math.min(origShuffle.toLong, nBi / 100000L + 1L))
    spark.conf.set(shuffleKey, sized.toString)
    if (nBi < 100000L) {
      spark.conf.set(aqeKey, "false")
      spark.conf.set(codegenKey, "false")
    }

    val lblObs = Observation()
    val lbl0 = bi.groupBy(col("src").as("node"))
      .agg(least(col("src"), min(col("dst"))).as("lab"))
      .observe(lblObs, count(lit(1)).as("n"))
      .eagerCheckpoint()
    // the label table is exactly one row per node, every round
    val nNodes = CCF.observedOrCount(lblObs, "pj labels")(Map("n" -> lbl0.count()))("n")
    var lbl = org.apache.spark.sql.graft.Bridge.withStats(lbl0, nNodes)
    var olderCkpt: DataFrame = null
    var iteration = 0
    var converged = false
    val history = scala.collection.mutable.ArrayBuffer.empty[Long]

    // r18 (guide §2.4): with the label table under the broadcast bound, the
    // rounds' only distributed frame is the STATIC topology — partition it
    // by src ONCE (checkpoint preserving the layout) and every round plans
    // zero exchanges: the neighbor-min groupBy(src) rides the build
    // partitioning, the label lookup and the n-row jump table are
    // broadcasts. Past the bound the rounds keep the shuffled-join shape
    // and bi keeps the distinct()'s layout (a src repartition would be a
    // wasted extra shuffle there — the shuffled round joins by dst).
    val bcastLbl = nNodes <= spark.conf.getOption(MaxBroadcastNodesKey)
      .map(_.toLong).getOrElse(MaxBroadcastNodes)
    val biRounds =
      if (bcastLbl) {
        val b = bi.repartition(col("src")).eagerCheckpointKeepPartitioning()
        CCF.freeCheckpoint(bi0)
        org.apache.spark.sql.graft.Bridge.withStats(b, nBi)
      } else bi

    try {
      while (iteration < maxIterations && !converged) {
        iteration += 1
        val lt = lbl.select(col("node").as("_t"), col("lab").as("_tl"))
        val obs = Observation()
        val next0 = (if (bcastLbl) {
          bcastRound(biRounds, lt)
        } else {
          // ONE lookup join serves both steps: look up the labels of
          // N(u) ∪ {lab(u)} — the neighbor-min AND the pointer jump
          // (lab(lab(u))) — then take the running min. Fixpoint condition is
          // identical to applying the two steps separately: lab(u) ≤ lab(v)
          // for every neighbor v and lab(u) ≤ lab(lab(u)).
          val targets = biRounds.unionAll(
            lbl.select(col("node").as("src"), col("lab").as("dst")))
          // inner joins are total: every target is a node id, every node has a row
          val looked = targets.join(lt, col("dst") === col("_t"))
            .groupBy(col("src"))
            .agg(min(col("_tl")).as("nm"))
          lbl.join(looked, col("node") === col("src"))
            .select(col("node"), col("lab"), least(col("lab"), col("nm")).as("newlab"))
        })
          .observe(obs, coalesce(sum(when(col("newlab") =!= col("lab"), 1L)), lit(0L)).as("changed"))
          .select(col("node"), col("newlab").as("lab"))
          .eagerCheckpoint()
        // fallback recomputes changed by diffing the materialized checkpoint
        // against the still-live previous label table — read BEFORE freeing it
        val changed = CCF.observedOrCount(obs, s"pj round $iteration")(Map(
          "changed" -> next0.select(col("node"), col("lab").as("nl"))
            .join(lbl.select(col("node"), col("lab").as("ol")), "node")
            .where(col("nl") =!= col("ol")).count()))("changed")
        if (olderCkpt != null) CCF.freeCheckpoint(olderCkpt)
        olderCkpt = lbl
        lbl = org.apache.spark.sql.graft.Bridge.withStats(next0, nNodes)
        history += changed
        converged = changed == 0L
      }
    } finally {
      spark.conf.set(shuffleKey, origShuffle)
      spark.conf.set(aqeKey, origAqe)
      spark.conf.set(codegenKey, origCodegen)
    }
    if (olderCkpt != null) CCF.freeCheckpoint(olderCkpt)
    // r19 (ADVICE r18): free exactly the live topology checkpoint — on the
    // bcast path bi0 was already freed when the src-partitioned copy was
    // made, so freeing `bi` again would be a misleading re-free; on the
    // non-bcast path biRounds IS bi, one free suffices.
    if (biRounds ne bi) CCF.freeCheckpoint(biRounds) else CCF.freeCheckpoint(bi)

    val assignments = lbl.where(col("lab") =!= col("node"))
      .select(col("node"), col("lab").as("component"))
    CCF.CCFResult(assignments, iteration, converged, history.toSeq, engine = "pj")
  }
}
