package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys (SURVEY.md §7.4: hub-vertex skew is the
 * reference's own open weakness, `RESULTS.md:119`). AQE's skew-join split
 * handles most cases at runtime; explicit salting remains the tool when one
 * key dominates so badly that even split partitions bottleneck, or when the
 * join is not a sort-merge join AQE can split.
 *
 * Mechanics: the left (large, skewed) side gets a random salt in [0, n);
 * the right side is exploded n× with every salt value; the join key becomes
 * (key, salt), spreading each hot key over n reducers. Row multiplicity is
 * preserved exactly — the explode side meets each left row at exactly one
 * salt value.
 */
object SkewJoin {

  private val LeftTypes = Set("left", "left_outer", "leftouter")

  /** Equi-join `left.key == right.key` with `salt`-way key spreading.
    * Column name sets of the two sides must be disjoint apart from the key
    * (standard join hygiene), and neither side may already carry a
    * `__salt` column (it would be silently clobbered — rejected loudly).
    *
    * The salt is DETERMINISTIC per row content — `xxhash64` over the full
    * left row (or `saltOn`, see below) mod `salt` — never `rand()`: a
    * random salt makes the left map stage INDETERMINATE, and under a
    * shuffle-fetch-failure recompute re-executed rows can draw different
    * salts than the ones reducers already fetched — the SPARK-23207 class
    * of silent row loss/duplication, on exactly the big shuffles this
    * operator exists for. The content hash is retry-stable; its one
    * degeneration is FULLY-identical duplicate left rows, which share a
    * salt and stay on one reducer — pass `saltOn` (a stable unique id
    * column, which real rows have) to spread those, or collapse exact
    * duplicates first (usually wanted anyway).
    *
    * 100 TB sizing note: the right side is replicated `salt`× for EVERY
    * key, not only hot ones — shuffle volume on that side scales with the
    * salt. Keep the right side the small/dimension side, or apply the
    * two-path refinement (salt only keys above a frequency threshold,
    * plain-join the tail, union) when both sides are large.
    *
    * Supported join types: `inner` and left-outer (`left` / `left_outer`) —
    * both are exact under the explode-right shape, because every left row
    * carries exactly ONE salt value and therefore meets each matching right
    * row exactly once (inner multiplicity preserved) or, with no key match at
    * any salt, survives exactly once with nulls (left-outer). Right/full
    * outer are rejected: the right side is replicated `salt`x, so an
    * unmatched right row would surface once PER REPLICA — those shapes need
    * the mirrored salting (salt right, explode left) instead. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 joinType: String = "inner",
                 saltOn: Option[Column] = None): DataFrame = {
    require(salt > 0, "salt must be positive")
    val jt = joinType.toLowerCase(java.util.Locale.ROOT)
    require(jt == "inner" || LeftTypes(jt),
      s"saltedJoin supports inner and left joins, got '$joinType'")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin uses __salt as a scratch column; an input already has one " +
        "(it would be silently clobbered) — rename it first")
    val saltSrc = saltOn.getOrElse(xxhash64(left.columns.map(left(_)): _*))
    val l = left
      .withColumn("__salt", pmod(saltSrc, lit(salt.toLong)).cast("int"))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"), jt)
      .drop(r(key)).drop(l("__salt")).drop(r("__salt"))
  }
}
