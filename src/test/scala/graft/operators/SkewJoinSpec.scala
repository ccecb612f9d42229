package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows on a skewed key") {
    // orders↔lineitem on orderkey: multiplicity-preserving equi-join
    val o = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_totalprice"))
    val l = Tables.lineitem(spark, sf()).select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val plain = l.join(o, "o_orderkey")
    val salted = SkewJoin.saltedJoin(l, o, "o_orderkey", salt = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("o_orderkey").count()
    val b = salted.groupBy("o_orderkey").count()
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("salting spreads a hot key across salt values (content-hash salt, r15)") {
    import spark.implicits._
    // hot rows carry DISTINCT payloads (the realistic shape — real rows
    // have ids); the deterministic content-hash salt spreads them. Fully
    // identical duplicate rows share a salt by design — the documented
    // degeneration, handled via saltOn (below) or upfront dedup.
    val hot = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val dim = Seq(("hot", 99)).toDF("k", "w")
    val joined = SkewJoin.saltedJoin(hot, dim, "k", salt = 8)
    assert(joined.count() === 1000)
    // distribution check with the SAME salt expression the join uses
    val salts = hot.withColumn("s",
        pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .groupBy("s").count().collect()
    assert(salts.length >= 6) // hot key spread over most of the 8 salts
    // identical duplicate rows: spread restored by a caller-supplied
    // stable-id salt column
    val dup = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
      .withColumn("id", monotonically_increasing_id())
    val viaId = SkewJoin.saltedJoin(dup, dim, "k", salt = 8,
      saltOn = Some(col("id")))
    assert(viaId.count() === 1000)
  }

  test("left join: unmatched left rows survive exactly once, matched as inner") {
    import spark.implicits._
    // planted skew: one hot key dominating the left side, plus keys the
    // dimension doesn't cover at all
    val left = (Seq.fill(5000)(("hot", 1)) ++ (1 to 200).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val dim = (Seq(("hot", 0)) ++ (1 to 100).map(i => (s"k$i", i * 10))).toDF("k", "w")
    val plain = left.join(dim, Seq("k"), "left")
    val salted = SkewJoin.saltedJoin(left, dim, "k", salt = 8, joinType = "left")
    assert(salted.count() === plain.count())
    // exact multiset agreement, nulls included
    val a = plain.groupBy("k", "v", "w").count()
    val b = salted.groupBy("k", "v", "w").count()
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // the uncovered keys k101..k200 must appear exactly once with a null w
    assert(salted.where(col("w").isNull).count() === 100)
  }

  test("right/full outer are rejected (explode-right shape would duplicate)") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("k", "v")
    val dim = Seq(("a", 2)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, dim, "k", salt = 4, joinType = "right")
    }
  }

  test("planted skew: salting spreads the hot key's rows over many shuffle partitions") {
    import spark.implicits._
    // Without salting, every row of the hot key hashes to ONE reducer — the
    // straggler. With the (key, salt) composite, the same rows spread over up
    // to `salt` partitions. Measure actual partition placement both ways.
    val parts = 16
    val left = Seq.fill(4000)(("hot", 1)).toDF("k", "v")
    val unsalted = left.repartition(parts, col("k"))
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    // distinct payloads so the content-hash salt has entropy (real rows do)
    val leftD = (1 to 4000).map(i => ("hot", i)).toDF("k", "v")
    val salted = leftD.withColumn("s", pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .repartition(parts, col("k"), col("s"))
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(unsalted === 1L, s"plain hash: hot key lands on $unsalted partitions")
    assert(salted >= 5L, s"salted: hot key spread over only $salted partitions")
  }
}
