package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/**
 * Native Catalyst expression for the dense-vector dot product (SURVEY.md
 * §7.3 revisited: the built-in `aggregate(zip_with(...))` formulation is
 * CodegenFallback — interpreted per element — which made the all-pairs
 * cosine operators the bench bottleneck at sf0.1; a codegen'd loop is ~20x
 * faster and exactly what the "custom Expression beats UDF beats the rest"
 * escape hatch is for).
 *
 * Semantics are IDENTICAL to the previous higher-order-function pipeline and
 * the DuckDB oracle: a sequential ascending-index left fold
 * `acc = ((0.0 + x0*y0) + x1*y1) + ...` in double — so results stay
 * bit-identical (no reassociation, no FMA).
 */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  // null on mismatched lengths (below), regardless of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Mismatched lengths → null, never a silent truncation: the DuckDB oracle's
  // fixed-range fold yields NULL for a short array, and a quietly-truncated
  // dot product would diverge across engines exactly on malformed embeddings
  // (ADVICE r02). Null surfaces the bad row loudly in any downstream compare.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null slot propagates (the L1Distance idiom, ADVICE r03): getDouble
      // on a null slot silently reads 0.0, while the replaced HOF fold and
      // the DuckDB oracle both return NULL — a silent cross-engine
      // divergence on exactly the malformed rows a compare should surface
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |    }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Native Catalyst expression for the L1 (Manhattan) distance between two
 * dense numeric arrays — the m6 media-near-dup histogram comparison and the
 * general "perceptual signature" distance. The built-in formulation
 * `aggregate(zip_with(a, b, (x,y) -> abs(x-y)), 0, (acc,v) -> acc+v)` is
 * CodegenFallback (interpreted per element, materializing the intermediate
 * array); this is one codegen'd loop — the same ~20x shape as [[DotProduct]]
 * (SURVEY.md §7.3).
 *
 * Semantics match the replaced HOF pipeline exactly:
 *  - mismatched lengths → null (zip_with pads with null; abs/sum propagate);
 *  - any null element → null (same propagation);
 *  - array<bigint> inputs → exact bigint sum; float/double inputs → the same
 *    sequential ascending-index fold in double (no reassociation).
 */
case class L1Distance(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_l1"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private lazy val integral =
    elemType(left) == org.apache.spark.sql.types.LongType &&
      elemType(right) == org.apache.spark.sql.types.LongType

  override def dataType: DataType =
    if (integral) org.apache.spark.sql.types.LongType else DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType | FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint|float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def getter(e: Expression): String = elemType(e) match {
    case org.apache.spark.sql.types.LongType => "getLong"
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var i = 0
    if (integral) {
      var acc = 0L
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += math.abs(x.getLong(i) - y.getLong(i))
        i += 1
      }
      acc
    } else {
      // hoist the type discriminants out of the loop (the DotProduct lf/rf
      // pattern): elemType() re-derives dataType per element otherwise
      def disc(e: Expression): Int = elemType(e) match {
        case org.apache.spark.sql.types.LongType => 0
        case FloatType => 1
        case DoubleType => 2
      }
      val lt = disc(left); val rt = disc(right)
      def get(arr: ArrayData, t: Int, j: Int): Double = t match {
        case 0 => arr.getLong(j).toDouble
        case 1 => arr.getFloat(j).toDouble
        case _ => arr.getDouble(j)
      }
      var acc = 0.0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += math.abs(get(x, lt, i) - get(y, rt, i))
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (jt, cast) = if (integral) ("long", "") else ("double", "(double) ")
    val lGet = getter(left); val rGet = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  $jt $acc = 0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $jt $d = $cast$a.$lGet($i) - $cast$b.$rGet($i);
         |      $acc += ($d < 0) ? -$d : $d;
         |    }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Native Catalyst expression for the polynomial rolling string hash
 * h = fold over code points: (h*31 + cp) % mod — semantically identical to
 * the `aggregate(transform(split(s,''), ascii), ...)` higher-order pipeline
 * (each 1-char split produces its code point) and to the DuckDB oracle, but
 * codegen'd: one loop instead of materializing a per-char string array and
 * interpreting a fold over Literal-wrapped steps.
 */
case class PolyHash(child: Expression, mod: Long) extends Expression {

  override def prettyName: String = "graft_polyhash"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
    else if (mod <= 0 || mod > (1L << 57))
      // analysis-time, not a per-row ArithmeticException (mod 0) or silent
      // negative hashes (mod < 0) at execution; the 2^57 ceiling keeps the
      // fold step h*31 + codepoint (< mod*31 + 2^21) inside a long
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 0 < mod <= 2^57, got $mod")
    else TypeCheckResult.TypeCheckSuccess

  /** Shared by eval and the generated code (static call keeps codegen tiny). */
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else PolyHash.hash(v.toString, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
         |${c.code}
         |boolean ${ev.isNull} = ${c.isNull};
         |long ${ev.value} = -1L;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.PolyHash.hash(${c.value}.toString(), ${mod}L);
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object PolyHash {
  /** Code-point left fold, mod every step (positive, < mod). */
  def hash(s: String, mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}

/**
 * Native Catalyst expression producing the DISTINCT hashed word-k-gram
 * shingles of a text in one pass: tokenize on single spaces, fold the
 * polynomial hash over each k-gram's exact character sequence (words joined
 * by ' '), and dedup. Equivalent to
 * `list_distinct(list_transform(<k-gram strings>, polyhash))` in the DuckDB
 * oracle — but never materializes a shingle string. The interpreted
 * transform/slice/concat_ws pipeline it replaces was the dedup family's
 * dominant cost at sf0.1 (0.8 ms/doc just to build shingle arrays).
 */
case class ShingleHashes(child: Expression, k: Int, mod: Long, distinct: Boolean = true)
  extends Expression {

  override def prettyName: String =
    if (distinct) "graft_shingle_hashes" else "graft_shingle_hashes_all"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
    else if (k < 1 || mod <= 0 || mod > (1L << 57))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1 and 0 < mod <= 2^57, got k=$k mod=$mod")
    else TypeCheckResult.TypeCheckSuccess

  private def fn = if (distinct) "compute" else "computeAll"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else if (distinct) ShingleHashes.compute(v.toString, k, mod)
    else ShingleHashes.computeAll(v.toString, k, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
         |${c.code}
         |boolean ${ev.isNull} = ${c.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.ShingleHashes.$fn(${c.value}.toString(), $k, ${mod}L);
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ShingleHashes {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Distinct k-gram hashes in first-occurrence order. */
  def compute(text: String, k: Int, mod: Long): ArrayData = {
    val words = text.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      seen.add(gramHash(words, i, k, mod))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  /** ALL k-gram hashes in positional order (multiset — the tf path; the
    * distinct [[compute]] is the set path used by Jaccard/MinHash). */
  def computeAll(text: String, k: Int, mod: Long): ArrayData = {
    val words = text.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = gramHash(words, i, k, mod); i += 1 }
    new GenericArrayData(out)
  }

  @inline private def gramHash(words: Array[String], i: Int, k: Int, mod: Long): Long = {
    var h = 0L
    var w = 0
    while (w < k) {
      if (w > 0) h = (h * 31L + ' '.toInt) % mod
      val word = words(i + w)
      var j = 0
      val len = word.length
      while (j < len) {
        val cp = word.codePointAt(j)
        h = (h * 31L + cp) % mod
        j += Character.charCount(cp)
      }
      w += 1
    }
    h
  }
}

/**
 * Deterministically ordered float sum: sorts an `array<struct<key bigint,
 * term double>>` by (key, term) and folds the terms sequentially in double.
 * This is the ONE legitimate way to sum floats that must hash-match across
 * engines — a plain SUM() is accumulation-order-nondeterministic in Spark
 * AND DuckDB; the oracle twin is `list_reduce(list_prepend(0.0, list(term
 * ORDER BY key, term)), (a,x) -> a+x)`. Replaces the interpreted
 * `array_sort` (per-element comparator dispatch) + `transform` + `aggregate`
 * HOF chain, which dominated t6's runtime at sf0.1.
 */
case class SortedTermSum(child: Expression) extends Expression {

  override def prettyName: String = "graft_sorted_term_sum"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  // nullable regardless of the child: a null struct SLOT or FIELD inside a
  // non-null array yields a null result (r15) — child.nullable alone let
  // the optimizer treat the result as non-null and read the unset 0.0
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
      if s.length == 2 && s(0).dataType == org.apache.spark.sql.types.LongType &&
        s(1).dataType == org.apache.spark.sql.types.DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, double>>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else SortedTermSum.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    val code =
      code"""
         |${c.code}
         |boolean ${ev.isNull} = ${c.isNull};
         |double ${ev.value} = 0.0;
         |if (!${ev.isNull}) {
         |  java.lang.Double $boxed = graft.functions.SortedTermSum.compute(${c.value});
         |  if ($boxed == null) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $boxed.doubleValue(); }
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SortedTermSum {
  /** Boxed so a null struct slot or null field can PROPAGATE (the replaced
    * array_sort + aggregate chain returns NULL there; getLong/getDouble on
    * a null slot would silently read 0 — and getStruct returns null, which
    * previously NPE'd the task for direct graft_sorted_term_sum SQL). */
  def compute(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val keys = new Array[Long](n)
    val terms = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val st = arr.getStruct(i, 2)
      if (st.isNullAt(0) || st.isNullAt(1)) return null
      keys(i) = st.getLong(0)
      terms(i) = st.getDouble(1)
      i += 1
    }
    // sort parallel arrays by (key, term): index sort, then fold in order
    val idx = Array.range(0, n)
    val wrapped: Array[Integer] = idx.map(Integer.valueOf)
    java.util.Arrays.sort(wrapped, (a: Integer, b: Integer) => {
      val c = java.lang.Long.compare(keys(a), keys(b))
      if (c != 0) c else java.lang.Double.compare(terms(a), terms(b))
    })
    var acc = 0.0
    i = 0
    while (i < n) { acc += terms(wrapped(i)); i += 1 }
    acc
  }
}

/**
 * Random-hyperplane LSH bucket as a single compact expression: bit j of the
 * result is sign(v · plane_j) for `numPlanes` deterministic pseudo-random
 * planes. Replaces an 8-plane × 64-literal expression tree whose analysis +
 * Janino compilation alone cost ~6 s per query plan; the semantics (fold
 * order, plane formula) are bit-identical to that tree and to the DuckDB
 * oracle's replication of the same integer formula.
 */
case class LshBucket(child: Expression, numPlanes: Int, dim: Int) extends Expression {

  override def prettyName: String = "graft_lsh_bucket"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  // null for vectors shorter than `dim` (see eval), regardless of child
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Vectors shorter than `dim` → null, not a truncated-plane bucket: silent
  // truncation would scatter malformed embeddings into valid-looking buckets
  // and diverge from the oracle's fixed-range fold (ADVICE r02).
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() < dim) null
      else LshBucket.bucket(a, isFloat, numPlanes, dim)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
         |${c.code}
         |boolean ${ev.isNull} = ${c.isNull} || ${c.value}.numElements() < $dim;
         |int ${ev.value} = -1;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.LshBucket.bucket(${c.value}, $isFloat, $numPlanes, $dim);
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object LshBucket {
  /** plane(j,d) = (((j*dim + d + 1) * 2654435761) % 2001 - 1000) / 1000.0 —
    * the shared deterministic formula (also inlined in the DuckDB oracles). */
  def planeVal(j: Int, d: Int, dim: Int): Double =
    (((j.toLong * dim + d + 1) * 2654435761L) % 2001L - 1000L) / 1000.0

  /** DuckDB SQL replicating [[bucket]] exactly (same plane formula, same
    * ascending fold per plane). */
  def sql(v: String, numPlanes: Int, dim: Int): String =
    (0 until numPlanes).map { j =>
      val planeVal = s"((($j * $dim + i + 1) * 2654435761) % 2001 - 1000) / 1000.0"
      val dotJ = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(range(0, $dim), i -> CAST($v[i+1] AS DOUBLE) * ($planeVal))), " +
        s"(acc, x) -> acc + x)"
      s"CASE WHEN $dotJ >= 0 THEN ${1 << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((numPlanes, dim), { case (np, dm) =>
      Array.tabulate(np, dm)((j, d) => planeVal(j, d, dm))
    })

  def bucket(v: ArrayData, isFloat: Boolean, numPlanes: Int, dim: Int): Int = {
    val ps = planes(numPlanes, dim)
    val n = math.min(v.numElements(), dim)
    // a null element makes EVERY plane's dot NULL in the SQL twin, whose
    // CASE WHEN dot >= 0 then leaves every bit unset — mirror that (bucket
    // 0) instead of silently reading the slot as 0.0 and possibly setting
    // bits the oracle does not (r15 review)
    var nn = 0
    while (nn < n) { if (v.isNullAt(nn)) return 0; nn += 1 }
    var b = 0
    var j = 0
    while (j < numPlanes) {
      val p = ps(j)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        acc += x * p(d)
        d += 1
      }
      if (acc >= 0) b |= 1 << j
      j += 1
    }
    b
  }
}

/**
 * Native Catalyst expression computing the full MinHash signature in ONE pass
 * over the shingle-hash array: for each input hash h, update all `numHashes`
 * running minima of (a_j*h + b_j) % mod. Replaces `numHashes` interpreted
 * `array_min(transform(...))` passes (Spark HOFs are CodegenFallback), which
 * made the MinHash+LSH pipeline the dedup family's bench bottleneck — 32
 * array materializations + interpreted folds per document vs one tight loop.
 *
 * The affine coefficients are derived HERE (companion `coeffA`/`coeffB`) and
 * consumed by both engines: the Spark expression and the DuckDB oracle SQL
 * generator (`TextFunctions.HashA/HashB` delegate to the same formulas), so
 * cross-engine results stay bit-identical by construction.
 *
 * Semantics match the replaced pipeline exactly: an empty input array yields
 * an all-null signature (array_min of an empty array is null); a_j*h + b_j
 * stays < 2^63 because mod < 2^30.
 */
case class MinHashSignature(child: Expression, numHashes: Int, mod: Long) extends Expression {

  override def prettyName: String = "graft_minhash_sig"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      if (numHashes < 1 || mod <= 0 || mod > (1L << 31))
        // a_j, b_j < mod and the input is normalized into [0, mod), so
        // a_j*h + b_j < mod^2 + mod — inside a long only when mod <= 2^31
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires numHashes >= 1 and 0 < mod <= 2^31, got " +
            s"numHashes=$numHashes mod=$mod")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashSignature.compute(v.asInstanceOf[ArrayData], numHashes, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
         |${c.code}
         |boolean ${ev.isNull} = ${c.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.MinHashSignature.compute(${c.value}, $numHashes, ${mod}L);
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSignature {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Deterministic per-hash affine params (a_i odd, both < mod), from Knuth's
    * multiplicative constant — the single source for both engines. */
  def coeffA(i: Int, mod: Long): Long = ((2L * i + 1L) * 2654435761L) % mod
  def coeffB(i: Int, mod: Long): Long = ((i + 1L) * 40503L * 65537L) % mod

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  private def coeffs(numHashes: Int, mod: Long): (Array[Long], Array[Long]) =
    cache.computeIfAbsent((numHashes, mod), { case (n, m) =>
      (Array.tabulate(n)(coeffA(_, m)), Array.tabulate(n)(coeffB(_, m)))
    })

  def compute(sh: ArrayData, numHashes: Int, mod: Long): ArrayData = {
    val n = sh.numElements()
    val (a, b) = coeffs(numHashes, mod)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    var seen = 0
    while (i < n) {
      // Null elements are skipped, matching the replaced pipeline: transform()
      // maps a null to null and array_min ignores nulls (ADVICE r03 — getLong
      // on a null slot reads 0, a silent cross-engine divergence).
      if (!sh.isNullAt(i)) {
        seen += 1
        // normalize into [0, mod): a no-op for the library path (shingle
        // hashes are already < mod), and for arbitrary SQL inputs it makes
        // a_j*h + b_j provably overflow-free (the class comment's
        // precondition, previously assumed but unenforced — r15 review)
        val h0 = sh.getLong(i) % mod
        val h = if (h0 < 0) h0 + mod else h0
        var j = 0
        while (j < numHashes) {
          val v = (a(j) * h + b(j)) % mod
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    // empty / all-null input: array_min of an empty or all-null array is null
    if (seen == 0) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(mins)
  }
}

/** Public column API for the custom vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.functions.sqrt

  /** Sequential-fold dot product in double (codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm via the same fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L1 (Manhattan) distance, codegen'd: exact bigint sum for array<bigint>
    * inputs, sequential double fold otherwise (see [[L1Distance]]). */
  def l1(a: Column, b: Column): Column =
    Bridge.column(L1Distance(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd polynomial rolling hash (see [[PolyHash]]). */
  def polyHash(s: Column, mod: Long): Column =
    Bridge.column(PolyHash(Bridge.expression(s), mod))

  /** Codegen'd distinct hashed word-k-gram shingles (see [[ShingleHashes]]). */
  def shingleHashes(text: Column, k: Int, mod: Long): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), k, mod))

  /** ALL hashed word-k-gram shingles in order (multiset, for tf counting). */
  def shingleHashesAll(text: Column, k: Int, mod: Long): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), k, mod, distinct = false))

  /** Order-deterministic float sum over (key, term) structs (see
    * [[SortedTermSum]]): sorted by (key, term), folded sequentially. */
  def sortedTermSum(arr: Column): Column =
    Bridge.column(SortedTermSum(Bridge.expression(arr)))

  /** Codegen'd random-hyperplane LSH bucket (see [[LshBucket]]). */
  def lshBucket(v: Column, numPlanes: Int, dim: Int): Column =
    Bridge.column(LshBucket(Bridge.expression(v), numPlanes, dim))

  /** Codegen'd one-pass MinHash signature (see [[MinHashSignature]]). */
  def minhashSig(sh: Column, numHashes: Int, mod: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(sh), numHashes, mod))
}
