package graft.graph

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Derived-graph builders over the driver test tables (SURVEY.md §7.1 step 3):
 * real tabular inputs for the CCF core that a DuckDB oracle can re-derive.
 */
object GraphBuilders {

  /**
   * Co-purchase part graph: two parts are connected iff some order contains
   * both (self-join of lineitem on l_orderkey). Edges are canonical
   * (smaller, larger) `l_partkey` pairs, distinct.
   *
   * Scale notes: the self-join shuffles lineitem once by `l_orderkey` and the
   * exchange is shared by both sides (Spark reuses it), then `distinct`
   * shuffles the pair set by (src,dst) with map-side partial aggregation. Only
   * the two key columns are read from parquet (column pruning — check
   * `ReadSchema`). Orders with k lines emit C(k,2) pairs; a pathological
   * mega-order would be a skew hotspot, handled by AQE skew-join splitting.
   *
   * The SHUFFLE_HASH hint pins the scale-correct plan: without it the planner
   * broadcasts the (locally small) fact projection, and a broadcast join has
   * NO exchange — the pair explosion and the distinct's partial aggregate then
   * run at the parquet scan's file parallelism (near-serial on a single-file
   * local table; measured 2.2x slower warm). At fact-table scale broadcast is
   * off the table anyway; the hinted plan is the same one a cluster would run.
   */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val a = li.toDF("o", "src")
    val b = li.toDF("o", "dst")
    a.hint("shuffle_hash").join(b, "o")
      .where(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()
  }
}
