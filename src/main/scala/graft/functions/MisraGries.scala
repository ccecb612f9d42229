package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable Misra-Gries heavy-hitter summary: at most `k` (item, count)
 * counters plus the exact processed total.
 *
 * Update is the classic MG step (present → +1; room → insert 1; full →
 * decrement ALL counters, dropping zeros); merge is the mergeable-summaries
 * form (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
 * PODS 2012): sum the two counter maps, and if more than k counters remain,
 * subtract the (k+1)-th largest count from every counter and drop the
 * non-positives. Both preserve the MG guarantee with the errors ADDING to
 * at most total/(k+1): for every item, true − total/(k+1) ≤ est ≤ true —
 * so any item with true frequency strictly above total/(k+1) (the t8
 * heavy-hitter bar at K = k) has est > 0 and CANNOT be absent from the
 * summary, under any partitioning, arrival order, or merge tree.
 *
 * That superset-with-exact-total contract is the point: the summary never
 * claims exactness per item (estimates are order-dependent — the batch t8
 * recount step is where exactness comes from), it guarantees no heavy
 * hitter escapes while the state stays O(k) per group. Used by the
 * streaming t8 twin ([[graft.streaming.Streams.heavyHittersStream]]),
 * where the aggregation-state row per open window holds exactly this
 * buffer.
 *
 * Returns `struct<n_total bigint, cands array<struct<word string, est
 * bigint>>>`, candidates ordered (est DESC, word ASC) — the output order
 * is deterministic GIVEN the summary, though estimates themselves depend
 * on arrival order (inherent to MG; the superset contract does not).
 */
final class MGState(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)
  var total = 0L

  def add(w: String): Unit = {
    total += 1
    val c = counts.getOrDefault(w, 0L)
    if (c > 0L) counts.put(w, c + 1)
    else if (counts.size < k) counts.put(w, 1L)
    else {
      // full and absent: decrement everything, drop zeros (the MG step)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
      }
    }
  }

  def mergeFrom(o: MGState): Unit = {
    total += o.total
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from all, drop non-positives
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

case class MisraGriesAgg(
    child: Expression, // word
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState] with UnaryLike[Expression] {

  override def prettyName: String = "graft_misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("cands", ArrayType(StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column and k > 0; got " +
          s"${child.dataType.catalogString}, k=$k")
    }

  override def createAggregationBuffer(): MGState = new MGState(k)

  override def update(b: MGState, input: InternalRow): MGState = {
    val w = child.eval(input)
    // toString copies out of Spark's reused row buffers — mandatory before
    // holding the key across rows
    if (w != null) b.add(w.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGState, o: MGState): MGState = { b.mergeFrom(o); b }

  override def eval(b: MGState): Any = {
    val entries = new Array[(String, Long)](b.counts.size)
    var i = 0
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val ordered = entries.sortBy { case (w, est) => (-est, w) }
    new GenericInternalRow(Array[Any](
      b.total,
      new GenericArrayData(ordered.map { case (w, est) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(w), est)): Any
      })))
  }

  override def serialize(b: MGState): Array[Byte] = {
    val items = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](b.counts.size)
    var bytes = 8 + 4
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val wb = e.getKey.getBytes(StandardCharsets.UTF_8)
      items += ((wb, e.getValue)); bytes += 4 + wb.length + 8
    }
    val buf = ByteBuffer.allocate(bytes)
    buf.putLong(b.total).putInt(items.size)
    items.foreach { case (wb, c) => buf.putInt(wb.length).put(wb).putLong(c) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new MGState(k)
    st.total = buf.getLong
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val wb = new Array[Byte](buf.getInt)
      buf.get(wb)
      st.counts.put(new String(wb, StandardCharsets.UTF_8), buf.getLong)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGries {
  /** `struct<n_total, cands array<struct<word, est>>>` — the ≤ k-counter
    * MG summary of `word` with the exact total. */
  def mg(word: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(word), k).toAggregateExpression())
}
