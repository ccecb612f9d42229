package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted-IVF lifecycle: build == inline s3, incremental append == full
  * rebuild (same centroids), and search scans ONLY probed cell partitions. */
class IvfIndexSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("ivf").toString

  private def corpus = {
    val e = graft.sources.Tables.embeddings(spark, sf())
    e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private def queries = corpus.where(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("v").as("qv"))

  test("search over the persisted index == inline s3 exactly") {
    IvfIndex.build(spark, sf(), s"$tmp/idx")
    val persisted = IvfIndex.search(spark, s"$tmp/idx", queries)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val inline = SimilarityQueries.defs("s3_knn_ivf")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(persisted === inline)
    assert(persisted.nonEmpty)
  }

  test("incremental append == rebuilding the posting lists in one shot") {
    // train on the first half only, then ingest the second half as a batch:
    // posting lists must equal assigning everything against those centroids
    val n = corpus.count()
    val half = n / 2
    IvfIndex.build(spark, sf(), s"$tmp/inc")
    // rebuild cells from scratch with half, then append the rest
    val cents = IvfIndex.centroids(spark, s"$tmp/inc")
    val first = corpus.where(col("vec_id") < half)
    val second = corpus.where(col("vec_id") >= half)
    // build a fresh index dir seeded with the same centroids
    cents.write.parquet(s"$tmp/inc2/centroids.parquet")
    IvfIndex.append(spark, s"$tmp/inc2", first)
    IvfIndex.append(spark, s"$tmp/inc2", second)
    val incremental = IvfIndex.cells(spark, s"$tmp/inc2")
      .select("cid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = IvfIndex.cells(spark, s"$tmp/inc")
      .select("cid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incremental === oneShot)
    // and search over the incrementally-built index matches too
    val a = IvfIndex.search(spark, s"$tmp/inc2", queries)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = IvfIndex.search(spark, s"$tmp/inc", queries)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b)
  }

  test("search reads only probed cell partitions (partition pruning)") {
    IvfIndex.build(spark, sf(), s"$tmp/prune")
    // which cells does the query batch probe?
    val probed = {
      val dot = graft.functions.VectorFunctions.dot _
      val q = queries.withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
      val cw = IvfIndex.centroids(spark, s"$tmp/prune")
        .select(col("cid"), col("cv"),
          sqrt(dot(col("cv"), col("cv"))).as("cn"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("pcos").desc, col("cid").asc)
      q.join(broadcast(cw))
        .select(col("query_id"), col("cid"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("pcos"))
        .withColumn("pr", row_number().over(pw))
        .where(col("pr") <= SimilarityQueries.NumProbes)
        .select("cid").distinct().collect().map(_.getLong(0)).toSet
    }
    val allCells = IvfIndex.cells(spark, s"$tmp/prune")
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    assume(probed.size < allCells.size, "need unprobed cells for the pruning claim")
    // Assert pruning from the PLAN, not from surviving rows (post-filter
    // input_file_name() only reflects rows that passed the filter — it would
    // hold even with a full scan): the FileSourceScan under the search's
    // posting read must select exactly the probed cid= partitions, and the
    // unpruned read must select all of them.
    def partitionsSelected(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.selectedPartitions.partitionCount).sum
    val filtered = IvfIndex.cells(spark, s"$tmp/prune")
      .where(col("cid").isin(probed.toSeq: _*))
    assert(partitionsSelected(filtered) === probed.size)
    assert(partitionsSelected(IvfIndex.cells(spark, s"$tmp/prune")) === allCells.size)
  }

  test("incremental semantic dedup: corpus dups rejected, novel admitted, append closes the loop") {
    IvfIndex.build(spark, sf(), s"$tmp/sem")
    val base = corpus.count()
    // batch 1: exact copies of corpus vectors 0..4 under fresh ids (certain
    // same-cell cosine-1 corpus hits) + orthogonal-ish novel vectors built
    // by rotating corpus vectors 5..9 (cross-rotation cosine ~0, same trick
    // as the scale-up tiling — novel content in the same space)
    val dups = corpus.where(col("vec_id") < 5)
      .select((col("vec_id") + base).as("vec_id"), col("v"))
    val novel = corpus.where(col("vec_id") >= 5 && col("vec_id") < 10)
      .select((col("vec_id") + base).as("vec_id"),
        expr("concat(slice(v, 33, 32), slice(v, 1, 32))").as("v"))
    val verdict = IvfIndex.semanticDedupIncremental(
        spark, s"$tmp/sem", dups.union(novel), 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdict.size === 10)
    (0L until 5L).foreach(i => assert(!verdict(base + i), s"dup ${base + i} admitted"))
    val admitted = verdict.filter(_._2).keys.toSet
    assert(admitted === (5L until 10L).map(base + _).toSet,
      s"expected exactly the novel rotations admitted, got $admitted")
    // append ONLY the admitted — the production write half
    IvfIndex.append(spark, s"$tmp/sem",
      dups.union(novel).where(col("vec_id").isin(admitted.toSeq: _*)))
    // batch 2 = identical copies of batch 1's admitted under fresh ids:
    // every one must now be rejected AGAINST THE APPENDED rows (they match
    // nothing in the original corpus), proving admissions participate
    val batch2 = dups.union(novel)
      .where(col("vec_id").isin(admitted.toSeq: _*))
      .select((col("vec_id") + base).as("vec_id"), col("v"))
    val v2 = IvfIndex.semanticDedupIncremental(spark, s"$tmp/sem", batch2, 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v2.nonEmpty && v2.values.forall(a => !a), s"batch-2 copies admitted: $v2")
  }

  test("incremental semantic dedup: batch-internal pairs resolved by d10's keep rule") {
    IvfIndex.build(spark, sf(), s"$tmp/sem2")
    val base = corpus.count()
    // two exact copies of one NOVEL vector (rotation of corpus vec 7):
    // no corpus hit, one in-batch cosine-1 pair — exactly the larger id
    // drops (equal ccos ties break to the larger id)
    val novel = corpus.where(col("vec_id") === 7)
      .select(col("v")).crossJoin(spark.range(2).toDF("i"))
      .select((col("i") + base).as("vec_id"),
        expr("concat(slice(v, 33, 32), slice(v, 1, 32))").as("v"))
    val v = IvfIndex.semanticDedupIncremental(spark, s"$tmp/sem2", novel, 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v(base) === true, "keep-rule winner (smaller id) was rejected")
    assert(v(base + 1) === false, "keep-rule loser (larger id) was admitted")
  }

  /** Unit vector in the plane spanned by dims 0/1, at `deg` degrees. */
  private def planar(deg: Double): Array[Double] = {
    val r = math.toRadians(deg)
    Array.tabulate(64)(d => if (d == 0) math.cos(r) else if (d == 1) math.sin(r) else 0.0)
  }

  test("incremental semantic dedup: corpus-rejected member does not evict its batch twin (ADVICE r10)") {
    import spark.implicits._
    // hand-built one-cell index so the geometry is exact: centroid at 0°,
    // corpus vector c at 30°. Batch: X at 15° (cos(X,c)=cos15=0.966 >= 0.95
    // -> corpus hit), Y at 0° (cos(Y,c)=cos30=0.866 < 0.95 -> no corpus
    // hit; cos(X,Y)=cos15 >= 0.95 -> in-batch pair). Y sits ON the centroid
    // so ccos(Y)=1 > ccos(X): the old keep rule would have evicted Y for
    // losing to the already-rejected X — one corpus hit dropping BOTH batch
    // members. The survivors-only rule admits Y.
    val dir = s"$tmp/advice"
    Seq((0L, planar(0))).toDF("cid", "cv").write.parquet(s"$dir/centroids.parquet")
    IvfIndex.append(spark, dir, Seq((0L, planar(30))).toDF("vec_id", "v"))
    val batch = Seq((100L, planar(15)), (101L, planar(0))).toDF("vec_id", "v")
    val v = IvfIndex.semanticDedupIncremental(spark, dir, batch, 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v(100L) === false, "X duplicates the corpus and must be rejected")
    assert(v(101L) === true, "Y hits nothing admitted — must survive X's corpus rejection")
  }

  test("incremental semantic dedup: hot posting cell sub-splits without losing the exact-dup hit") {
    import spark.implicits._
    // one-cell index holding 32 corpus vectors (cap 4 -> nsub = 8): a batch
    // copy of a corpus vector must still be rejected (identical vectors
    // share an LSH sub-cell by construction), and a batch vector far from
    // everything admitted.
    val dir = s"$tmp/hot"
    Seq((0L, planar(0))).toDF("cid", "cv").write.parquet(s"$dir/centroids.parquet")
    val rnd = new scala.util.Random(11)
    val corpusVecs = (0 until 32).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()))
    }
    IvfIndex.append(spark, dir, corpusVecs.toDF("vec_id", "v"))
    val dupOfSeven = corpusVecs(7)._2
    val batch = Seq((100L, dupOfSeven), (101L, Array.fill(64)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    val v = IvfIndex.semanticDedupIncremental(spark, dir, batch, 0.999, cap = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v(100L) === false, "exact corpus copy must be rejected under the sub-split")
    assert(v(101L) === true, "unrelated vector must be admitted")
  }

  test("drift trigger: balanced appends stay quiet, a skewed append flips needsRebuild") {
    import spark.implicits._
    def unit(j: Int): Array[Double] = Array.tabulate(64)(d => if (d == j) 1.0 else 0.0)
    val dir = s"$tmp/drift"
    Seq((0L, unit(0)), (1L, unit(1)), (2L, unit(2)), (3L, unit(3)))
      .toDF("cid", "cv").write.parquet(s"$dir/centroids.parquet")
    // 5 vectors per cell — perfectly balanced, ratio 1.0
    val balanced = for (j <- 0 until 4; i <- 0 until 5)
      yield ((j * 5 + i).toLong, unit(j))
    IvfIndex.append(spark, dir, balanced.toDF("vec_id", "v"))
    assert(!IvfIndex.needsRebuild(spark, dir, skewThreshold = 2.0))
    // dump 100 more into cell 0: counts 105/5/5/5, max/mean = 3.5 > 2.0
    val skewed = (0 until 100).map(i => ((100 + i).toLong, unit(0)))
    IvfIndex.append(spark, dir, skewed.toDF("vec_id", "v"))
    assert(IvfIndex.needsRebuild(spark, dir, skewThreshold = 2.0))
    // the criterion is the tunable: the same 3.5 skew under a permissive
    // threshold does not fire
    assert(!IvfIndex.needsRebuild(spark, dir, skewThreshold = 3.9))
  }

  test("rebuild closes the drift loop: trigger -> rebuild -> atomic publish -> appends continue") {
    import spark.implicits._
    def unit(j: Int): Array[Double] = Array.tabulate(64)(d => if (d == j) 1.0 else 0.0)
    val root = s"$tmp/lifecycle"
    // v1: 4 centroids fanned across the (0,1) plane; balanced corpus of 5
    // exact copies per fan direction (ids grouped per cell)
    Seq(0L -> planar(0), 1L -> planar(10), 2L -> planar(20), 3L -> planar(30))
      .toDF("cid", "cv").write.parquet(s"$root/v1/centroids.parquet")
    val balanced = for (j <- 0 until 4; i <- 0 until 5)
      yield ((j * 5 + i).toLong, planar(10.0 * j))
    IvfIndex.append(spark, s"$root/v1", balanced.toDF("vec_id", "v"))
    IvfIndex.publish(spark, root, "v1")
    assert(IvfIndex.current(spark, root) === s"$root/v1")
    assert(!IvfIndex.needsRebuild(spark, IvfIndex.current(spark, root), skewThreshold = 2.0))
    // DRIFT: two tight blobs in directions the v1 centroids never covered —
    // all 100 tie at cos 0 against every fan centroid and pile into cell 0
    val drifted = (0 until 50).map(i => ((100 + i).toLong, unit(4))) ++
      (0 until 50).map(i => ((150 + i).toLong, unit(5)))
    IvfIndex.append(spark, IvfIndex.current(spark, root), drifted.toDF("vec_id", "v"))
    assert(IvfIndex.needsRebuild(spark, IvfIndex.current(spark, root), skewThreshold = 2.0),
      "the drifted blobs must trip the skew trigger (105/5/5/5)")
    val preRebuildSearch = IvfIndex.search(spark, IvfIndex.current(spark, root),
      Seq((0L, planar(0))).toDF("query_id", "qv")).collect().toSet
    // REBUILD into a fresh dir; v1 stays the live version throughout
    IvfIndex.rebuild(spark, IvfIndex.current(spark, root), s"$root/v2", iters = 3)
    assert(IvfIndex.current(spark, root) === s"$root/v1",
      "a reader must keep resolving the old complete index until publish")
    assert(IvfIndex.search(spark, IvfIndex.current(spark, root),
      Seq((0L, planar(0))).toDF("query_id", "qv")).collect().toSet === preRebuildSearch,
      "the live index must be bit-identical while the rebuild writes next door")
    // ATOMIC SWAP
    IvfIndex.publish(spark, root, "v2")
    val v2 = IvfIndex.current(spark, root)
    assert(v2 === s"$root/v2")
    // the farthest-point reseed split the hot cell: skew cleared
    assert(!IvfIndex.needsRebuild(spark, v2, skewThreshold = 2.0),
      "rebuild must actually clear the skew that triggered it")
    // every corpus vector survived the rewrite (posting lists recounted)
    assert(IvfIndex.cells(spark, v2).count() === 120)
    // and the drifted blobs landed in cells of their own, not one hot cell
    val v2counts = IvfIndex.cells(spark, v2).groupBy("cid").count()
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(v2counts.max <= 60, s"hot cell not split: $v2counts")
    // appends CONTINUE against the new current — stats keep accruing
    IvfIndex.append(spark, v2, Seq((300L, planar(5))).toDF("vec_id", "v"))
    assert(IvfIndex.cells(spark, v2).count() === 121)
    val post = IvfIndex.search(spark, v2, Seq((0L, unit(4))).toDF("query_id", "qv"))
      .collect()
    assert(post.nonEmpty, "search over the rebuilt index must find the drifted blob")
  }

  test("rebuild recounts stats from the corpus itself — a damaged stats file is repaired") {
    import spark.implicits._
    // single-writer crash model (ADVICE r11): cells landed, the stats
    // read-modify-write did not. Fabricate exactly that — an index whose
    // stats.parquet undercounts — and prove rebuild derives the new stats
    // from cells.parquet, not from the damaged file.
    val dir = s"$tmp/repair/v1"
    Seq(0L -> planar(0), 1L -> planar(90)).toDF("cid", "cv")
      .write.parquet(s"$dir/centroids.parquet")
    val vecs = (0 until 8).map(i => (i.toLong, planar(if (i % 2 == 0) 0 else 90)))
    IvfIndex.append(spark, dir, vecs.toDF("vec_id", "v"))
    // clobber stats with an undercount (as a crashed append would leave)
    Seq((0L, 1L)).toDF("cid", "n").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/stats.parquet")
    IvfIndex.rebuild(spark, dir, s"$tmp/repair/v2", iters = 1)
    val stats = spark.read.parquet(s"$tmp/repair/v2/stats.parquet")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = IvfIndex.cells(spark, s"$tmp/repair/v2").groupBy("cid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats === truth, "rebuilt stats must equal the true per-cell populations")
    assert(stats.values.sum === 8L)
  }

  test("publish refuses a filesystem whose rename is not known-atomic") {
    // the pointer swap's whole guarantee is rename(OVERWRITE) atomicity —
    // true on file/hdfs/viewfs, silently FALSE on object stores (copy +
    // delete). The guard must fail loudly instead of downgrading silently.
    val e = intercept[IllegalArgumentException] {
      IvfIndex.publish(spark, "s3a://bucket/index-root", "v1")
    }
    assert(e.getMessage.contains("atomic rename"), e.getMessage)
    // the sanctioned schemes still pass (exercised end-to-end by the
    // lifecycle test above on the local default FS)
    // and the refusal names the scheme-agnostic alternative
    assert(e.getMessage.contains("publishVersioned"), e.getMessage)
  }

  test("versioned-manifest publish: highest manifest wins, create-exclusive settles races") {
    // the object-store pointer protocol (no rename, no overwrite): each
    // publish writes an immutable MANIFEST-<n>, readers resolve the highest
    // n — readable end to end on the local FS, and the create-exclusive
    // primitive it rests on is exactly a conditional PUT on object stores
    val root = java.nio.file.Files.createTempDirectory("ivf-vroot").toString
    assert(intercept[IllegalStateException] {
      IvfIndex.currentVersioned(spark, root)
    }.getMessage.contains("nothing published"))
    assert(IvfIndex.publishVersioned(spark, root, "v1") === 0L)
    assert(IvfIndex.currentVersioned(spark, root) === s"$root/v1")
    assert(IvfIndex.publishVersioned(spark, root, "v2") === 1L)
    assert(IvfIndex.currentVersioned(spark, root) === s"$root/v2",
      "a later manifest must supersede the earlier one")
    // simulate losing the create race: plant the manifest number the next
    // publish would pick; it must skip past it, not clobber or fail
    val planted = new java.io.File(root, f"MANIFEST-${2L}%020d")
    java.nio.file.Files.writeString(planted.toPath, "intruder")
    assert(IvfIndex.publishVersioned(spark, root, "v3") === 3L)
    assert(IvfIndex.currentVersioned(spark, root) === s"$root/v3")
    assert(java.nio.file.Files.readString(planted.toPath) === "intruder",
      "an existing manifest is immutable — create-exclusive must not overwrite it")
    // an EMPTY manifest above the live one = a publisher mid-write or dead
    // between create and write (the create-visible-filesystem window): the
    // reader must skip it — resolve v3, never a torn "<root>/" pointer —
    // and the next publish must number past it
    val inflight = new java.io.File(root, f"MANIFEST-${4L}%020d")
    java.nio.file.Files.createFile(inflight.toPath)
    assert(IvfIndex.currentVersioned(spark, root) === s"$root/v3",
      "an empty (in-flight/crashed) manifest must not resolve")
    assert(IvfIndex.publishVersioned(spark, root, "v4") === 5L)
    assert(IvfIndex.currentVersioned(spark, root) === s"$root/v4")
  }

  test("farthest-point seeding stops at the distinct-direction count — no duplicate centroids") {
    // dedup-heavy pool: 40 copies of one direction + one other — only 2
    // distinct directions exist, so asking for k=5 seeds must yield 2, not
    // the same vector re-chosen 4 times (duplicate centroids would leave
    // permanently empty cells in the rebuilt index)
    val a = planar(0)
    val b = planar(90)
    val pool = ((0 until 40).map(i => (i.toLong, a)) :+ (99L, b)).toArray
    val seeds = SimilarityQueries.farthestPointSeeds(pool, 5)
    assert(seeds.length === 2, s"expected 2 distinct seeds, got ${seeds.length}")
    assert(seeds.map(_.toSeq).toSet === Set(a.toSeq, b.toSeq))
    // and a pool with plenty of distinct directions still fills k
    val rich = Array.tabulate(10)(i => (i.toLong, planar(18.0 * i)))
    assert(SimilarityQueries.farthestPointSeeds(rich, 5).length === 5)
  }

  test("sampled rebuild (the 100 TB path) still clears the skew that triggered it") {
    import spark.implicits._
    def unit(j: Int): Array[Double] = Array.tabulate(64)(d => if (d == j) 1.0 else 0.0)
    // same drift geometry as the lifecycle test, rebuilt with Lloyd trained
    // on a ~50% deterministic hash-sample: the seed pool still spans the
    // full corpus (it is bounded separately), so the hot cell still splits
    val dir = s"$tmp/sampled/v1"
    Seq(0L -> planar(0), 1L -> planar(10), 2L -> planar(20), 3L -> planar(30))
      .toDF("cid", "cv").write.parquet(s"$dir/centroids.parquet")
    val balanced = for (j <- 0 until 4; i <- 0 until 5)
      yield ((j * 5 + i).toLong, planar(10.0 * j))
    val drifted = (0 until 50).map(i => ((100 + i).toLong, unit(4))) ++
      (0 until 50).map(i => ((150 + i).toLong, unit(5)))
    IvfIndex.append(spark, dir, (balanced ++ drifted).toDF("vec_id", "v"))
    assert(IvfIndex.needsRebuild(spark, dir, skewThreshold = 2.0))
    IvfIndex.rebuild(spark, dir, s"$tmp/sampled/v2", iters = 3, samplePermille = 500)
    assert(!IvfIndex.needsRebuild(spark, s"$tmp/sampled/v2", skewThreshold = 2.0),
      "a sample-trained rebuild must still split the hot cell")
    assert(IvfIndex.cells(spark, s"$tmp/sampled/v2").count() === 120,
      "the posting rewrite must cover every vector even when Lloyd trains on a sample")
  }
}
