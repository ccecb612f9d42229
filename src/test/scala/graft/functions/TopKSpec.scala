package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-state top-k aggregate must agree with the ranking-window idiom
  * on a total order, across partitionings (merge path) and with nulls. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("MisraGries: superset of exact heavy hitters + MG bounds, any partitioning") {
    // skewed stream: 2 true heavy hitters, a warm word just under the bar,
    // and a long rare tail — exactly the shape MG exists for
    val words = Seq.fill(500)("hot") ++ Seq.fill(130)("warm2") ++
      Seq.fill(90)("warm1") ++ (0 until 600).map(i => s"rare$i")
    val total = words.size.toLong // 1320
    val k = 9                     // bar = total / (k+1) = 132
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavy = exact.filter(_._2 > total / (k + 1.0)).keySet // {hot}
    assert(heavy === Set("hot") && exact("warm2") <= total / (k + 1.0))
    val rnd = new scala.util.Random(11)
    for (parts <- Seq(1, 8)) {
      val df = rnd.shuffle(words).toDF("word").repartition(parts)
      val row = df.agg(MisraGries.mg(col("word"), k).as("s"))
        .select(col("s.n_total"), col("s.cands")).head
      assert(row.getLong(0) === total, s"parts=$parts: total must be exact")
      val cands = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cands.size <= k, s"parts=$parts: state bound")
      // the superset guarantee: no heavy hitter can be absent
      assert(heavy.subsetOf(cands.keySet), s"parts=$parts: $cands")
      // per-candidate MG bounds: true - total/(k+1) <= est <= true
      for ((w, est) <- cands) {
        assert(est <= exact(w), s"parts=$parts: $w over-estimated")
        assert(est >= exact(w) - total / (k + 1.0), s"parts=$parts: $w under bound")
      }
    }
  }

  // Property sweep (the CCFPropertySpec bounded-seed convention): on seeded
  // random Zipf-ish streams at random k and partitioning, the MG guarantee
  // must hold — exact total, |cands| <= k, every true heavy hitter present,
  // and true - total/(k+1) <= est <= true for every candidate.
  for (seed <- Seq(3, 17, 41)) {
    test(s"MisraGries property: random Zipf stream honors the MG guarantee, seed=$seed") {
      val rnd = new scala.util.Random(seed)
      val vocab = 50 + rnd.nextInt(400)
      val n = 2000 + rnd.nextInt(4000)
      // Zipf-ish: word i drawn with weight ~ 1/(i+1)
      val cum = (0 until vocab).map(i => 1.0 / (i + 1)).scanLeft(0.0)(_ + _).tail
      val z = cum.last
      val words = Seq.fill(n) {
        val u = rnd.nextDouble() * z
        s"w${cum.indexWhere(_ >= u)}"
      }
      val k = 3 + rnd.nextInt(20)
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = n.toLong
      val heavy = exact.filter(_._2 > total / (k + 1.0)).keySet
      val row = words.toDF("word").repartition(1 + rnd.nextInt(12))
        .agg(MisraGries.mg(col("word"), k).as("s"))
        .select(col("s.n_total"), col("s.cands")).head
      assert(row.getLong(0) === total)
      val cands = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cands.size <= k)
      assert(heavy.subsetOf(cands.keySet), s"k=$k heavy=$heavy cands=$cands")
      for ((w, est) <- cands)
        assert(est <= exact(w) && est >= exact(w) - total / (k + 1.0), s"k=$k $w")
    }
  }

  test("topK == row_number window on (score desc, id asc), any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      (i % 13L, rnd.nextInt(40).toDouble / 8.0, i.toLong) // heavy score ties
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("key", "score", "id").repartition(parts)
      val agg = df.groupBy("key")
        .agg(TopK.topK(col("score"), col("id"), 5).as("tk"))
        .select(col("key"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("key"), (col("pos") + 1).as("rank"), col("e.id").as("id"),
          col("e.score").as("score"))
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
      val win = df.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5).select("key", "rank", "id", "score")
      assert(agg.except(win).isEmpty && win.except(agg).isEmpty,
        s"parts=$parts: agg/window mismatch")
    }
  }

  test("fewer rows than k yields all rows, ranked") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L)).toDF("key", "score", "id")
    val out = df.groupBy("key").agg(TopK.topK(col("score"), col("id"), 5).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.score", "e.id")
      .as[(Double, Long)].collect().toSeq
    assert(out === Seq((0.9, 11L), (0.5, 10L)))
  }

  test("null score or id contributes nothing") {
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Long)](
      (1L, null, 1L), (1L, 0.7, null), (1L, 0.3, 5L))
      .toDF("key", "score", "id")
    val out = df.groupBy("key").agg(TopK.topK(col("score"), col("id"), 3).as("tk"))
      .select(size(col("tk"))).as[Int].collect()
    assert(out.toSeq === Seq(1))
  }

  test("state round-trips through serialize/deserialize") {
    val st = new TopKState(3)
    Seq((0.1, 9L), (0.5, 4L), (0.5, 2L), (0.9, 7L), (0.2, 1L)).foreach {
      case (s, i) => st.insert(s, i)
    }
    val agg = TopKByScore(
      org.apache.spark.sql.graft.Bridge.expression(lit(0.0)),
      org.apache.spark.sql.graft.Bridge.expression(lit(0L)), 3)
    val back = agg.deserialize(agg.serialize(st))
    assert(back.n === 3)
    assert((0 until back.n).map(i => (back.scores(i), back.ids(i))) ===
      Seq((0.9, 7L), (0.5, 2L), (0.5, 4L)))
  }
}
