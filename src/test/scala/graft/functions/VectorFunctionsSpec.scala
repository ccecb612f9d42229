package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** The hand-written codegen expressions vs their built-in higher-order
  * formulations: results must be bit-identical (same fold order) in both
  * eval modes. Each test runs the comparison through a real plan, so the
  * generated-code path is what executes. */
class VectorFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("DotProduct == aggregate/zip_with left fold, bit-identical") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("L1Distance == aggregate/zip_with fold: exact bigint, double, nulls, mismatch") {
    // bigint arrays: exact integer sum, identical to the HOF formulation
    val longs = Seq(
      (Array(1L, 5L, 9L), Array(3L, 5L, 2L)),          // 2 + 0 + 7 = 9
      (Array(0L, 0L), Array(0L, 0L)),
      (Array(Long.MaxValue / 2, 0L), Array(0L, Long.MaxValue / 2))
    ).toDF("a", "b")
    longs.select(
      VectorFunctions.l1(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
        lit(0L), (acc, v) => acc + v).as("ref")).collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // float arrays: same sequential double fold, bit-identical
    val floats = Seq((Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)))
      .toDF("a", "b")
    floats.select(
      VectorFunctions.l1(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("ref")).collect()
      .foreach(r => assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // mismatched lengths and null elements → null (the zip_with propagation)
    val edge = Seq(
      (Array[java.lang.Long](1L, 2L), Array[java.lang.Long](1L)),
      (Array[java.lang.Long](1L, null), Array[java.lang.Long](1L, 2L))
    ).toDF("a", "b")
    edge.select(VectorFunctions.l1(col("a"), col("b"))).collect()
      .foreach(r => assert(r.isNullAt(0)))
  }

  test("PolyHash == split/ascii/fold pipeline on real document text") {
    val docs = graft.sources.Tables.documents(spark, sf()).limit(50)
    val P = TextFunctions.HashP
    val rows = docs.select(
      VectorFunctions.polyHash(col("text"), P).as("fast"),
      aggregate(transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L), (acc, x) => (acc * 31L + x) % P).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("ShingleHashes == distinct(hash(string shingles))") {
    val docs = graft.sources.Tables.documents(spark, sf()).limit(50)
    val P = TextFunctions.HashP
    val toks = TextFunctions.tokens(col("text"))
    val stringShingles = TextFunctions.shingles(toks, 3)
    val rows = docs.select(
      VectorFunctions.shingleHashes(col("text"), 3, P).as("fast"),
      array_distinct(transform(stringShingles, s => VectorFunctions.polyHash(s, P))).as("ref")
    ).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet === r.getSeq[Long](1).toSet)
      assert(r.getSeq[Long](0).length === r.getSeq[Long](1).length) // both distinct
    }
  }

  test("ShingleHashes edge cases: short text, empty string") {
    val df = Seq("one two", "", "a b c", "a b c d").toDF("text")
    val rows = df.select(VectorFunctions.shingleHashes(col("text"), 3, 1000003L)).collect()
    assert(rows(0).getSeq[Long](0).isEmpty) // 2 tokens < k
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).getSeq[Long](0).length === 1)
    assert(rows(3).getSeq[Long](0).length === 2)
  }

  test("LshBucket == per-plane sign-of-dot with the shared formula") {
    val embs = graft.sources.Tables.embeddings(spark, sf()).limit(50)
    val ref = (0 until 8).map { j =>
      val plane = array((0 until 64).map(d => lit(LshBucket.planeVal(j, d, 64))): _*)
      when(VectorFunctions.dot(col("embedding"), plane) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val rows = embs.select(
      VectorFunctions.lshBucket(col("embedding"), 8, 64).as("fast"),
      ref.as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("MinHashSignature == NumHashes x array_min(transform(...)) passes") {
    val P = TextFunctions.HashP
    val n = TextFunctions.NumHashes
    val docs = graft.sources.Tables.documents(spark, sf()).limit(50)
    val sh = docs.select(VectorFunctions.shingleHashes(col("text"), 3, P).as("sh"))
      .where(size(col("sh")) > 0)
    val ref = array((0 until n).map { j =>
      array_min(transform(col("sh"),
        h => (lit(TextFunctions.HashA(j)) * h + lit(TextFunctions.HashB(j))) % P))
    }: _*)
    val rows = sh.select(
      VectorFunctions.minhashSig(col("sh"), n, P).as("fast"), ref.as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("MinHashSignature edge cases: empty array -> all-null signature, null -> null") {
    val df = Seq(Some(Seq.empty[Long]), None).toDF("sh")
    val rows = df.select(VectorFunctions.minhashSig(col("sh"), 4, 1000003L)).collect()
    assert(rows(0).getSeq[Any](0) === Seq(null, null, null, null))
    assert(rows(1).isNullAt(0))
  }

  test("MinHashSignature skips null elements (array_min semantics, ADVICE r03)") {
    val P = 1000003L
    // null elements must be ignored, not read as hash 0; all-null -> all-null
    val df = Seq(
      (1, Seq[java.lang.Long](7L, null, 11L)),
      (2, Seq[java.lang.Long](7L, 11L)),
      (3, Seq[java.lang.Long](null, null))).toDF("id", "sh")
    val ref = array((0 until 4).map { j =>
      array_min(transform(col("sh"),
        h => (lit(MinHashSignature.coeffA(j, P)) * h + lit(MinHashSignature.coeffB(j, P))) % P))
    }: _*)
    val rows = df.select(col("id"),
      VectorFunctions.minhashSig(col("sh"), 4, P).as("fast"), ref.as("ref"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Any](1) === rows(0).getSeq[Any](2)) // nulls skipped
    assert(rows(0).getSeq[Any](1) === rows(1).getSeq[Any](1)) // same as without nulls
    assert(rows(2).getSeq[Any](1) === Seq(null, null, null, null))
  }

  test("null ELEMENTS: dot propagates null; lshBucket mirrors the SQL twin's bucket 0 (r15)") {
    // a null slot read via getDouble is silently 0.0 — the r15 review
    // class. DotProduct must return NULL like the HOF fold and the DuckDB
    // oracle; LshBucket must return 0 like its own SQL twin, where the
    // NULL dot leaves every CASE WHEN bit unset.
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), NULL, CAST(3.0 AS DOUBLE)) AS a, " +
        "array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)) AS b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d1"),
      VectorFunctions.dot(col("b"), col("a")).as("d2"),
      VectorFunctions.lshBucket(col("a"), 8, 3).as("ba"),
      VectorFunctions.lshBucket(col("b"), 8, 3).as("bb")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getInt(2) === 0, "null element => every plane's dot NULL => bucket 0")
    assert(r.getInt(3) !== 0, "the clean vector must bucket normally")
  }

  test("SortedTermSum: null struct slot/field returns null, never an NPE (r15)") {
    GraftFunctions.registerAll(spark)
    val viaNullSlot = spark.sql(
      "SELECT graft_sorted_term_sum(array(named_struct('g', 1L, 't', 1.5D), NULL)) AS s")
    assert(viaNullSlot.collect().head.isNullAt(0))
    val viaNullField = spark.sql(
      "SELECT graft_sorted_term_sum(array(named_struct('g', 1L, 't', CAST(NULL AS DOUBLE)))) AS s")
    assert(viaNullField.collect().head.isNullAt(0))
    val clean = spark.sql(
      "SELECT graft_sorted_term_sum(array(named_struct('g', 2L, 't', 1.5D), " +
        "named_struct('g', 1L, 't', 2.5D))) AS s")
    assert(clean.collect().head.getDouble(0) === 4.0)
  }

  test("MinHashSignature: out-of-range SQL inputs are normalized, in-range unchanged (r15)") {
    GraftFunctions.registerAll(spark)
    val m = TextFunctions.HashP
    // h and h + k*mod (including a negative representative) must hash alike:
    // the normalization makes the documented overflow precondition total
    val r = spark.sql(
      s"SELECT graft_minhash_sig(array(42L), 4, $m) AS base, " +
        s"graft_minhash_sig(array(42L + $m * 9L), 4, $m) AS shifted, " +
        s"graft_minhash_sig(array(42L - $m * 3L), 4, $m) AS negative").collect().head
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    assert(r.getSeq[Long](0) === r.getSeq[Long](2))
  }

  test("hash mod dials are validated at ANALYSIS time, not per-row (r15)") {
    GraftFunctions.registerAll(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_polyhash('abc', 0)").collect()
    }
    assert(e1.getMessage.contains("mod"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L), 4, -7)").collect()
    }
    assert(e2.getMessage.contains("mod"), e2.getMessage)
  }

  test("null propagation") {
    val df = Seq((Option.empty[String], Option.empty[Seq[Float]])).toDF("s", "v")
    val r = df.select(
      VectorFunctions.polyHash(col("s"), 97L),
      VectorFunctions.shingleHashes(col("s"), 3, 97L),
      VectorFunctions.lshBucket(col("v").cast("array<float>"), 8, 64),
      VectorFunctions.dot(col("v").cast("array<float>"), col("v").cast("array<float>"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("malformed vectors surface as null, never silent truncation (ADVICE r02)") {
    // length-mismatched dot product and an under-dim LSH input: both would
    // previously truncate to min-length and quietly diverge from the oracle
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f)), // mismatched
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))        // matched
    ).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.lshBucket(col("a"), 8, 64).as("lsh")).collect()
    assert(rows(0).isNullAt(0), "mismatched lengths must yield null")
    assert(rows(1).getDouble(0) === 11.0)
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1),
      "vectors shorter than dim must yield null buckets")
  }
}
