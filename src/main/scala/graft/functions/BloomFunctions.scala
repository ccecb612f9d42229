package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Bloom-filter membership probe as a codegen'd Catalyst expression — the
 * engine's runtime-filter building block for decontamination-style joins
 * (the same prune-then-verify move Spark's own runtime row-group filters
 * make, surfaced as an explicit operator).
 *
 * Why it matters at 100 TB: a semi-join of a corpus-sized gram stream
 * against a benchmark set shuffles the ENTIRE stream by gram. With a bloom
 * of the benchmark keys broadcast inside this expression, the stream is
 * pruned map-side with zero shuffle to ~(true hits + fpp x stream); only
 * survivors reach the exact verify join, whose left side is now tiny.
 * No false negatives => the verified result is EXACT (oracle-checkable);
 * false positives only cost verify-join rows, bounded by fpp.
 *
 * The filter bytes ride the expression itself (same pattern as Spark's
 * `BloomFilterMightContain`, whose bloom child is a scalar-subquery
 * result): ~1.2 MB per million keys at fpp 1e-3 — broadcast-sized for any
 * realistic benchmark/blocklist, deserialized once per executor thread.
 */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends Expression {

  override def prettyName: String = "graft_bloom_might_contain"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a long key input")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  /** Shared by eval and generated code (referenced via addReferenceObj). */
  def hit(h: Long): Boolean = bloom.mightContainLong(h)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else hit(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // the expression instance itself is the codegen reference: the generated
    // class holds one deserialized filter per thread via the lazy val
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContainLong].getName)
    val code =
      code"""
         |${c.code}
         |boolean ${ev.isNull} = ${c.isNull};
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $ref.hit(${c.value});
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomFunctions {

  /** Build a serialized long-key bloom from one column of `df` (driver-side
    * aggregate — Spark's `stat.bloomFilter` runs a distributed build and
    * merges per-partition filters; only the final bitset reaches the
    * driver). `expectedItems` sizes the bitset; `fpp` is the target
    * false-positive rate at that cardinality. */
  def buildLongBloom(df: DataFrame, colName: String,
                     expectedItems: Long, fpp: Double = 0.001): Array[Byte] = {
    val bf = df.stat.bloomFilter(colName, math.max(1L, expectedItems), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Probe column: true iff `key` (long) might be in the serialized bloom.
    * No false negatives; false positives at the built fpp. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), bloomBytes))
}
