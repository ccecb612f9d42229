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
 *   graft_sorted_term_sum(arr)    — order-deterministic (key,term) fold sum
 *   graft_minhash_sig(sh, n[, mod])   — one-pass n-hash MinHash signature
 *   graft_bloom_might_contain(k, bytes) — bloom probe (bytes a BINARY literal,
 *     e.g. from BloomFunctions.buildLongBloom — the SQL route to c7-style
 *     map-side prune-then-verify joins)
 *   graft_l1(a, b)                — L1 (Manhattan) array distance
 *   graft_interleave_bits(a, b)   — Morton (Z-order) bit interleave
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

  // accept any constant-foldable binary expression (unhex('...'), a plain
  // literal, ...): the builder runs at analysis time, BEFORE constant folding,
  // so fold here instead of pattern-matching on Literal
  private def binLit(e: Expression, what: String): Array[Byte] = e match {
    case f if f.foldable && f.dataType == org.apache.spark.sql.types.BinaryType =>
      f.eval() match {
        case v: Array[Byte] => v
        case null => throw new IllegalArgumentException(s"$what must not be null")
      }
    case other => throw new IllegalArgumentException(s"$what must be a constant binary expression, got $other")
  }

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
    },
    "graft_sorted_term_sum" -> { args: Seq[Expression] =>
      require(args.length == 1, "graft_sorted_term_sum(arr<struct<g,t>>)")
      SortedTermSum(args(0))
    },
    "graft_minhash_sig" -> { args: Seq[Expression] =>
      require(args.length == 2 || args.length == 3, "graft_minhash_sig(shingles, n[, mod])")
      MinHashSignature(args(0), intLit(args(1), "n"),
        if (args.length == 3) longLit(args(2), "mod") else graft.text.TextFunctions.HashP)
    },
    "graft_bloom_might_contain" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_bloom_might_contain(key, bloomBytes)")
      BloomMightContainLong(args(0), binLit(args(1), "bloomBytes"))
    },
    "graft_l1" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_l1(a, b)")
      L1Distance(args(0), args(1))
    },
    "graft_interleave_bits" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_interleave_bits(a, b)")
      InterleaveBits(args(0), args(1))
    }
  )

  /** Register all graft functions on an existing session. Idempotent. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.register(spark, name, b) }
}
