package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared versioned-manifest protocol (factored from IvfIndex in r15)
  * and its segment-artifact layer: create-exclusive numbering, completeness
  * sentinel (ADVICE r14 — torn partial bodies skipped like empty ones), and
  * the versioned band-index / admission-postings integrations. */
class ManifestsSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("publish/resolve round-trip: multi-line payload, highest complete manifest wins") {
    val root = freshRoot("manifests")
    assert(intercept[IllegalStateException] {
      Manifests.resolve(spark, root)
    }.getMessage.contains("nothing published"))
    assert(Manifests.resolveOption(spark, root).isEmpty)
    assert(Manifests.publish(spark, root, Seq("seg-a")) === 0L)
    assert(Manifests.resolve(spark, root) === Seq("seg-a"))
    assert(Manifests.publish(spark, root, Seq("seg-a", "seg-b")) === 1L)
    assert(Manifests.resolve(spark, root) === Seq("seg-a", "seg-b"))
  }

  test("torn manifests: empty AND partial non-empty bodies are skipped, never resolved") {
    // ADVICE r14: on create-visible filesystems the body is not atomic with
    // the create — a reader can race a publisher into an empty OR a
    // partially-written body. Both must read as in-flight-or-dead.
    val root = freshRoot("manifests-torn")
    Manifests.publish(spark, root, Seq("good"))
    // planted in-flight/crashed cases ABOVE the live manifest:
    java.nio.file.Files.createFile( // empty body
      java.nio.file.Path.of(root, f"MANIFEST-${1L}%020d"))
    java.nio.file.Files.writeString( // torn prefix: content, no sentinel
      java.nio.file.Path.of(root, f"MANIFEST-${2L}%020d"), "good2\n#EN")
    assert(Manifests.resolve(spark, root) === Seq("good"),
      "incomplete manifests above the live one must not resolve")
    // successor publishes number PAST the claims, and the planted bodies
    // stay immutable (create-exclusive must not clobber)
    assert(Manifests.publish(spark, root, Seq("good3")) === 3L)
    assert(Manifests.resolve(spark, root) === Seq("good3"))
    assert(java.nio.file.Files.readString(
      java.nio.file.Path.of(root, f"MANIFEST-${2L}%020d")) === "good2\n#EN")
    // a root holding ONLY incomplete manifests fails loudly — someone tried
    // to publish and never finished; silence would mask a dead publisher.
    // An EMPTY body among them is evidence of a mid-create crash, so the
    // message is the generic torn/in-flight one
    val torn = freshRoot("manifests-only-torn")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(torn, f"MANIFEST-${0L}%020d"), "half")
    java.nio.file.Files.createFile(
      java.nio.file.Path.of(torn, f"MANIFEST-${1L}%020d"))
    assert(intercept[IllegalStateException] {
      Manifests.resolve(spark, torn)
    }.getMessage.contains("no complete publish"))
    assert(intercept[IllegalStateException] {
      Manifests.resolveOption(spark, torn)
    }.getMessage.contains("no complete publish"))
  }

  test("v1 pre-sentinel roots raise the migration message, not the torn/crash one") {
    // ADVICE r15: a root published by the r14 pre-sentinel writer reads as
    // incomplete (correct refusal — trusting it would reopen the
    // partial-body window), but the generic torn/in-flight error sent
    // operators hunting a publisher crash; EVERY body non-empty and
    // sentinel-less is the v1 signature (torn prefixes come with empty or
    // few bodies, and the v1 writer always wrote whole bodies), so the
    // message must point at the one-line re-publish migration instead.
    val root = freshRoot("manifests-v1")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(root, f"MANIFEST-${0L}%020d"), "v1-version-a")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(root, f"MANIFEST-${1L}%020d"), "v1-version-b")
    val msg = intercept[IllegalStateException] {
      Manifests.resolve(spark, root)
    }.getMessage
    assert(msg.contains("v1") && msg.contains("re-publishing"), msg)
    // the documented migration: one re-publish of the current version
    // under the v2 writer, then the root resolves again
    Manifests.publish(spark, root, Seq("v1-version-b"))
    assert(Manifests.resolve(spark, root) === Seq("v1-version-b"))
  }

  test("appendSegment names survive driver restarts; vacuum reaps only leaked segments") {
    import spark.implicits._
    val root = freshRoot("segments-vacuum")
    Manifests.appendSegment(Seq((1L, "a")).toDF("id", "v"), root)
    Manifests.appendSegment(Seq((2L, "b")).toDF("id", "v"), root)
    // plant a LEAKED segment: written, never published (crash before
    // publish), older than the newest manifest
    val leaked = java.nio.file.Path.of(root, "seg-leaked-from-crash")
    Seq((99L, "x")).toDF("id", "v").write.parquet(leaked.toString)
    val newestManifest = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("MANIFEST-")).map(_.getName).max
    // backdate the dir AND its files: segment age is max(dir, file mtimes)
    // since ADVICE r16 (object stores zero out dir mtimes), and a real crash
    // remnant's files are all older than any later manifest
    val backdate = java.nio.file.attribute.FileTime.fromMillis(
      java.nio.file.Path.of(root, newestManifest).toFile.lastModified() - 60000)
    leaked.toFile.listFiles().foreach(f =>
      java.nio.file.Files.setLastModifiedTime(f.toPath, backdate))
    java.nio.file.Files.setLastModifiedTime(leaked, backdate)
    // and an IN-FLIGHT one: unreferenced but YOUNGER than the manifest —
    // vacuum must never touch it (could be an append about to publish)
    val inflight = java.nio.file.Path.of(root, "seg-inflight")
    Seq((100L, "y")).toDF("id", "v").write.parquet(inflight.toString)
    java.nio.file.Files.setLastModifiedTime(inflight,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    // object-store shape (ADVICE r16): dir mtime synthesized as 0 but the
    // in-progress FILES inside are fresh — the file mtimes must protect it
    val inflightS3 = java.nio.file.Path.of(root, "seg-inflight-objstore")
    Seq((101L, "z")).toDF("id", "v").write.parquet(inflightS3.toString)
    java.nio.file.Files.setLastModifiedTime(inflightS3,
      java.nio.file.attribute.FileTime.fromMillis(0L))
    val reaped = Manifests.vacuumSegments(spark, root)
    assert(reaped === Seq("seg-leaked-from-crash"), reaped)
    assert(!java.nio.file.Files.exists(leaked))
    assert(java.nio.file.Files.exists(inflight), "younger unreferenced segment spared")
    assert(java.nio.file.Files.exists(inflightS3),
      "zero dir-mtime segment with fresh files spared (object-store shape)")
    // the published set still reads whole
    assert(Manifests.readSegments(spark, root).count() === 2)
    // vacuum on an unpublished root is a no-op (everything may be in flight)
    val empty = freshRoot("segments-vacuum-empty")
    Seq((1L, "z")).toDF("id", "v").write.parquet(s"$empty/seg-any")
    assert(Manifests.vacuumSegments(spark, empty) === Seq.empty)
  }

  test("vacuumSnapshots: superseded snapshot dirs reaped past keepLast, staging and kept spared (r18)") {
    // the SNAPSHOT-protocol retention (the day-2 bundle shape): each
    // publish names a complete fresh dir; reader grace keeps the newest
    // keepLast generations, older payload dirs are reaped by name
    import spark.implicits._
    val root = freshRoot("snapshots-vacuum")
    def publishSnap(name: String): Unit = {
      Seq((1L, name)).toDF("id", "v").write.parquet(s"$root/$name")
      Manifests.publish(spark, root, Seq(name))
    }
    publishSnap("bundle-a"); publishSnap("bundle-b"); publishSnap("bundle-c")
    // a publisher's FRESH in-flight staging dir no payload mentions —
    // younger than the newest manifest, never touched
    val staging = java.nio.file.Path.of(root, "bundle-staging-in-flight")
    Seq((9L, "s")).toDF("id", "v").write.parquet(staging.toString)
    // an ORPHANED remnant: written, never published (crash before the
    // manifest landed), backdated below the newest manifest — reaped by
    // the orphan age rule (the vacuumSegments leak class, snapshot shape)
    val orphan = java.nio.file.Path.of(root, "bundle-crashed-publish")
    Seq((8L, "o")).toDF("id", "v").write.parquet(orphan.toString)
    val newestManifestMt = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("MANIFEST-")).map(_.lastModified()).max
    val backdate = java.nio.file.attribute.FileTime.fromMillis(newestManifestMt - 60000)
    orphan.toFile.listFiles().foreach(f =>
      java.nio.file.Files.setLastModifiedTime(f.toPath, backdate))
    java.nio.file.Files.setLastModifiedTime(orphan, backdate)
    // and an unreadable-age orphan (all mtimes read ~0) — skipped, never
    // guessed at
    val zeroAge = java.nio.file.Path.of(root, "bundle-zero-mtimes")
    Seq((7L, "z")).toDF("id", "v").write.parquet(zeroAge.toString)
    def zeroOut(p: java.nio.file.Path): Unit = {
      val f = p.toFile
      if (f.isDirectory) f.listFiles().foreach(c => zeroOut(c.toPath))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(0L))
    }
    zeroOut(zeroAge)
    val reaped = Manifests.vacuumSnapshots(spark, root, keepLast = 2)
    assert(reaped.sorted === Seq("bundle-a", "bundle-crashed-publish"), reaped)
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(root, "bundle-a")))
    assert(!java.nio.file.Files.exists(orphan), "backdated orphan reaped")
    assert(java.nio.file.Files.exists(java.nio.file.Path.of(root, "bundle-b")),
      "grace generation must survive")
    assert(java.nio.file.Files.exists(staging), "fresh unreferenced staging spared")
    assert(java.nio.file.Files.exists(zeroAge), "unreadable-age orphan spared")
    // the live snapshot still resolves and reads
    assert(Manifests.resolve(spark, root) === Seq("bundle-c"))
    assert(spark.read.parquet(s"$root/bundle-c").count() === 1)
    // idempotent: nothing left to reap
    assert(Manifests.vacuumSnapshots(spark, root, keepLast = 2) === Seq.empty)
    // a dir re-referenced by a KEPT manifest survives even if an old
    // manifest also names it (append-shaped payloads → safe no-op)
    val root2 = freshRoot("snapshots-vacuum-append-shape")
    Seq((1L, "x")).toDF("id", "v").write.parquet(s"$root2/seg-0")
    Manifests.publish(spark, root2, Seq("seg-0"))
    Seq((2L, "y")).toDF("id", "v").write.parquet(s"$root2/seg-1")
    Manifests.publish(spark, root2, Seq("seg-0", "seg-1"))
    Seq((3L, "z")).toDF("id", "v").write.parquet(s"$root2/seg-2")
    Manifests.publish(spark, root2, Seq("seg-0", "seg-1", "seg-2"))
    assert(Manifests.vacuumSnapshots(spark, root2, keepLast = 2) === Seq.empty)
  }

  test("vacuum ages PARTITIONED leaked segments through their one nesting level (r18)") {
    // ADVICE r17: a partitioned parquet segment's top level holds only
    // `col=`-subdirs; on an object store synthesizing dir mtimes as 0 the
    // flat check read age 0 and the leak was skipped forever. The age scan
    // now descends one level, so the nested files date the segment.
    import spark.implicits._
    val root = freshRoot("segments-vacuum-partitioned")
    Manifests.appendSegment(Seq((1L, "a")).toDF("id", "v"), root)
    val leaked = java.nio.file.Path.of(root, "seg-leaked-partitioned")
    Seq((99L, "p0"), (98L, "p1")).toDF("id", "part")
      .write.partitionBy("part").parquet(leaked.toString)
    // drop the top-level _SUCCESS marker: the advice scenario is a top
    // level holding ONLY subdirectories (a flat file would date the
    // segment even without the one-level descent)
    def dropTopFiles(p: java.nio.file.Path): Unit =
      p.toFile.listFiles().filterNot(_.isDirectory)
        .foreach(f => java.nio.file.Files.delete(f.toPath))
    dropTopFiles(leaked)
    val newestManifest = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("MANIFEST-")).map(_.getName).max
    val backdate = java.nio.file.attribute.FileTime.fromMillis(
      java.nio.file.Path.of(root, newestManifest).toFile.lastModified() - 60000)
    // a real remnant: every object older than the later manifest; the
    // object-store twist — ALL directory mtimes read (near) zero
    def walk(p: java.nio.file.Path): Unit = {
      val f = p.toFile
      if (f.isDirectory) {
        f.listFiles().foreach(c => walk(c.toPath))
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000L))
      } else java.nio.file.Files.setLastModifiedTime(p, backdate)
    }
    walk(leaked)
    // and the partitioned IN-FLIGHT shape: zeroed dirs, fresh nested files
    val inflight = java.nio.file.Path.of(root, "seg-inflight-partitioned")
    Seq((100L, "p0")).toDF("id", "part")
      .write.partitionBy("part").parquet(inflight.toString)
    dropTopFiles(inflight)
    java.nio.file.Files.setLastModifiedTime(inflight,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    inflight.toFile.listFiles().filter(_.isDirectory).foreach(d =>
      java.nio.file.Files.setLastModifiedTime(d.toPath,
        java.nio.file.attribute.FileTime.fromMillis(1000L)))
    val reaped = Manifests.vacuumSegments(spark, root)
    assert(reaped === Seq("seg-leaked-partitioned"), reaped)
    assert(!java.nio.file.Files.exists(leaked))
    assert(java.nio.file.Files.exists(inflight),
      "fresh nested files must spare a zero-dir-mtime partitioned segment")
    assert(Manifests.readSegments(spark, root).count() === 1)
  }

  test("payload guard: newline-bearing or sentinel-valued lines are refused") {
    val root = freshRoot("manifests-guard")
    intercept[IllegalArgumentException] { Manifests.publish(spark, root, Seq("a\nb")) }
    intercept[IllegalArgumentException] { Manifests.publish(spark, root, Seq("#END")) }
    intercept[IllegalArgumentException] { Manifests.publish(spark, root, Seq.empty) }
  }

  test("segment artifact: appends are whole-versions-only, readers see a consistent set") {
    import spark.implicits._
    val root = freshRoot("segments")
    val n0 = Manifests.appendSegment(Seq((1L, "a")).toDF("id", "v"), root)
    assert(n0 === 0L)
    assert(Manifests.readSegments(spark, root).collect().map(_.getLong(0)).toSet === Set(1L))
    Manifests.appendSegment(Seq((2L, "b")).toDF("id", "v"), root)
    assert(Manifests.readSegments(spark, root)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // a parquet dir written under the root but NOT yet manifest-listed (a
    // mid-append crash, or an in-flight writer) is invisible to readers —
    // the torn-read guarantee an in-place parquet append cannot give
    Seq((99L, "half")).toDF("id", "v").write.parquet(s"$root/seg-orphan")
    assert(Manifests.readSegments(spark, root)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("appendSegment recovers a root whose FIRST publish crashed mid-write") {
    // the wedge case: the very first publish died between create and body
    // write, leaving only a torn MANIFEST-0. Readers must stay loud, but
    // the APPEND path must number past the dead claim (no complete set
    // ever existed — empty prior is the truth), or the root is bricked
    // until manual cleanup.
    import spark.implicits._
    val root = freshRoot("segments-recover")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(root, f"MANIFEST-${0L}%020d"), "seg-dead\n#EN")
    assert(intercept[IllegalStateException] {
      Manifests.readSegments(spark, root)
    }.getMessage.contains("no complete publish"))
    assert(Manifests.appendSegment(Seq((1L, "a")).toDF("id", "v"), root) === 1L)
    assert(Manifests.readSegments(spark, root)
      .collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("versioned band index: closed ingest loop through the published segments") {
    import spark.implicits._
    import graft.queries.DedupQueries
    def doc(prefix: String) = (0 until 12).map(i => s"$prefix$i").mkString(" ")
    val root = freshRoot("bandidx-v")
    val corpus0 = Seq((1L, doc("a")), (2L, doc("b"))).toDF("doc_id", "text")
    DedupQueries.appendBandIndexVersioned(corpus0, root) // day 1: initial publish
    // batch 1 against the resolved index: the corpus dup drops, the novel
    // doc admits; its bands are appended AS A NEW VERSION
    val b1 = Seq((10L, doc("b")), (11L, doc("x"))).toDF("doc_id", "text")
    val adm1 = DedupQueries.incrementalDedup(corpus0, b1,
      Some(DedupQueries.readBandIndexVersioned(spark, root)))
    assert(adm1.select("doc_id").collect().map(_.getLong(0)).toSet === Set(11L))
    DedupQueries.appendBandIndexVersioned(adm1, root)
    // batch 2 duplicates ONLY batch 1's admission — visible solely through
    // the re-resolved versioned index (corpus text = old ∪ admitted)
    val corpus1 = corpus0.unionByName(adm1.select("doc_id", "text"))
    val b2 = Seq((20L, doc("x")), (21L, doc("z"))).toDF("doc_id", "text")
    val adm2 = DedupQueries.incrementalDedup(corpus1, b2,
      Some(DedupQueries.readBandIndexVersioned(spark, root)))
    assert(adm2.select("doc_id").collect().map(_.getLong(0)).toSet === Set(21L))
    // a reader that resolved BEFORE the append still holds day-1's complete
    // snapshot semantics; and a torn manifest planted above the live one
    // leaves resolution on the newest complete version
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(root, f"MANIFEST-${9L}%020d"), "seg-bogus")
    assert(DedupQueries.incrementalDedup(corpus1, b2,
        Some(DedupQueries.readBandIndexVersioned(spark, root)))
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(21L))
  }
}
