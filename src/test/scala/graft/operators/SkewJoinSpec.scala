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

  test("salting spreads a hot key across salt values") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
    val dim = Seq(("hot", 99)).toDF("k", "w")
    val joined = SkewJoin.saltedJoin(hot, dim, "k", salt = 8)
    assert(joined.count() === 1000)
    // distribution check on the salted left side (same seed logic)
    val salts = hot.withColumn("__salt", (rand(seed = 42) * 8).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length >= 6) // hot key spread over most of the 8 salts
  }
}
