package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/**
 * SQL registration for the custom codegen expressions, so `spark.sql` /
 * `expr` users can call them by name:
 *
 *   graft_dot(a, b)                — sequential-fold dot product (double)
 *   graft_polyhash(s[, mod])      — polynomial rolling string hash
 *   graft_shingle_hashes(s, k[, mod]) — distinct hashed word-k-gram shingles
 *   graft_lsh_bucket(v, planes, dim)  — hyperplane-sign LSH bucket
 *
 * Two registration paths:
 *  - `GraftFunctions.registerAll(spark)` on any existing session;
 *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session build
 *    (the SparkSessionExtensions route for spark-submit deployments).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
}

object GraftFunctions {

  private def longLit(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = longLit(e, what).toInt

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_dot(a, b)")
      DotProduct(args(0), args(1))
    },
    "graft_polyhash" -> { args: Seq[Expression] =>
      require(args.length == 1 || args.length == 2, "graft_polyhash(s[, mod])")
      PolyHash(args(0), if (args.length == 2) longLit(args(1), "mod") else graft.text.TextFunctions.HashP)
    },
    "graft_shingle_hashes" -> { args: Seq[Expression] =>
      require(args.length == 2 || args.length == 3, "graft_shingle_hashes(s, k[, mod])")
      ShingleHashes(args(0), intLit(args(1), "k"),
        if (args.length == 3) longLit(args(2), "mod") else graft.text.TextFunctions.HashP)
    },
    "graft_lsh_bucket" -> { args: Seq[Expression] =>
      require(args.length == 3, "graft_lsh_bucket(v, planes, dim)")
      LshBucket(args(0), intLit(args(1), "planes"), intLit(args(2), "dim"))
    }
  )

  /** Register all graft functions on an existing session. Idempotent. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.register(spark, name, b) }
}
