package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch-based approximate aggregates — the bounded-memory companions to the
 * exact rollups, for the scales where exactness costs a full shuffle of the
 * key space (SURVEY.md §2a O10 "approx variant for scale"; §2c checklist
 * "a novel sketch").
 *
 * These are NOT oracle-gated: sketch layouts (HyperLogLog++ registers,
 * KLL/GK quantile summaries) are engine-specific, so DuckDB's approximations
 * would differ bit-wise by design. Correctness is spec-tested as an error
 * BOUND against the exact answers (SketchesSpec), which is the actual
 * contract a sketch offers.
 *
 * 100 TB notes: both sketches are true aggregates — fixed-size partial
 * states combine map-side, the shuffle carries one sketch per group
 * (O(groups x sketch size), vs O(distinct keys) for exact distinct and
 * O(rows) for exact percentiles). An exact `distinct().count()` over a
 * 100 TB key space shuffles every key once; the HLL++ state is ~1.5 KB at
 * 2% rsd regardless of cardinality.
 */
object Sketches {

  /** Approximate number of CCF components: HLL++ over the component label
    * column of a converged assignment — the O10 distinct-count at sketch
    * cost. rsd = target relative standard deviation (Spark's default 5%;
    * 0.02 keeps the ~20k-component co-purchase graph inside ±3% whp). */
  def approxComponentCount(assignments: DataFrame, rsd: Double = 0.02): Long =
    assignments.agg(approxDistinctAgg(col("component"), rsd).as("n"))
      .head().getLong(0)

  /** Per-group approximate distinct count as a composable aggregation. */
  def approxDistinctAgg(c: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(c, rsd)

  /** Approximate quantiles of a numeric column, one pass, mergeable partial
    * summaries (Spark's percentile_approx / GK-style summary). `accuracy` is
    * the inverse rank-error knob: 10000 ≈ 0.01% rank error. */
  def approxQuantiles(df: DataFrame, colName: String, qs: Seq[Double],
                      accuracy: Int = 10000): Seq[Double] = {
    if (qs.isEmpty) return Seq.empty // array() would be a NullType literal
    val row = df.agg(percentile_approx(col(colName),
        array(qs.map(lit): _*), lit(accuracy)).as("q"))
      .head()
    // zero input rows OR an all-null column → percentile_approx yields
    // NULL, not an empty array; both map to Seq.empty here (callers zipping
    // qs against the result must treat empty as "no data", not "no error")
    if (row.isNullAt(0)) Seq.empty
    else row.getSeq[Any](0).map {
      case d: java.lang.Number => d.doubleValue() // incl. java BigDecimal
      case other => sys.error(
        s"approxQuantiles: unsupported element ${other.getClass.getName}")
    }
  }
}
