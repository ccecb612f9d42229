package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Bounded top-k accumulator: parallel arrays sorted by (score DESC, id ASC),
 * at most k entries. Insertion is a shift-right insertion sort step — O(k)
 * worst case, O(1) for the common below-threshold reject — which beats a
 * heap for the small k (≤ ~100) this aggregate targets, and keeps entries
 * ordered so eval() and serialize() are a straight copy.
 */
final class TopKState(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, scores(k - 1), ids(k - 1))) return
    var i = if (n < k) n else k - 1 // the slot vacated by dropping the worst
    while (i > 0 && better(s, id, scores(i - 1), ids(i - 1))) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(i) = s; ids(i) = id
    if (n < k) n += 1
  }
}

/**
 * Top-k per group as a [[TypedImperativeAggregate]]: keeps the k best
 * (score DESC, id ASC) pairs in a bounded state, combined map-side.
 *
 * This is the scale-path replacement for the `row_number() OVER (PARTITION BY
 * key ORDER BY score DESC)` + `WHERE rank <= k` idiom: the window form
 * shuffles EVERY scored row to its key's partition and sorts the full
 * partition before discarding all but k rows, while this aggregate's partial
 * states are combined map-side — each map task ships at most k entries per
 * key, and no sort ever materializes. At 100 TB (scoring n candidates per
 * query against a corpus) the shuffle shrinks from O(candidates) to
 * O(keys × k), and a skewed key costs the reducer O(candidates × k) ops in
 * O(k) memory instead of an O(candidates log candidates) sort spill.
 *
 * Determinism: total order (score DESC, id ASC) — ties cannot reorder, so
 * results are reproducible across partitionings and retries. Null score or
 * id contributes nothing (matching the window idiom, where a null score
 * sorts last and never enters the top k at these sizes).
 *
 * Returns `array<struct<score double, id bigint>>` ranked best-first; explode
 * with `posexplode` to recover (rank, id, score) rows.
 */
case class TopKByScore(
    left: Expression,  // score
    right: Expression, // id
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] with BinaryLike[Expression] {

  override def prettyName: String = "graft_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint) and k > 0; got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString}), k=$k")
    }

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null) b.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKState, o: TopKState): TopKState = {
    var i = 0
    while (i < o.n) { b.insert(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKState): Any =
    new GenericArrayData(Array.tabulate[Any](b.n) { i =>
      new GenericInternalRow(Array[Any](b.scores(i), b.ids(i)))
    })

  override def serialize(b: TopKState): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * b.n)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new TopKState(k)
    val n = buf.getInt
    var i = 0
    // entries arrive already ranked; insert preserves order in O(1) shifts
    while (i < n) { st.insert(buf.getDouble, buf.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopK {
  /** `array<struct<score, id>>` of the k best (score DESC, id ASC) pairs. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(
      Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())
}
