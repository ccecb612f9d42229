package graft.ccf

import graft.SparkSpec
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Pins the scaladoc contract: fixpoints scope session confs, so CONCURRENT
  * runs are safe on separate `newSession()`s (shared SparkContext, isolated
  * SQLConf). Both results must match their serial runs exactly. */
class ConcurrencySpec extends SparkSpec {

  test("concurrent fixpoints on separate sessions produce serial results") {
    val g1 = Generators.chainGraph(120)
    val g2 = Generators.randomGraph(150, 400, seed = 5)
    val serial1 = CCF.run(Generators.toDF(spark, g1)).assignments.collect().toSet
    val serial2 = CCF.run(Generators.toDF(spark, g2)).assignments.collect().toSet

    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val f1 = Future(CCF.run(Generators.toDF(s1, g1)).assignments.collect().toSet)
    val f2 = Future(PointerJump.run(Generators.toDF(s2, g2)).assignments.collect().toSet)
    val (r1, r2) = (Await.result(f1, 120.seconds), Await.result(f2, 120.seconds))
    assert(r1 === serial1)
    assert(r2 === serial2)
  }
}
