package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class GraphStoreSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-store").resolve("edges").toString

  test("write dedups on (src, dst) and read returns the snapshot") {
    import spark.implicits._
    val root = tmpRoot()
    val edges = Seq((1L, 2L, "a"), (2L, 1L, "b"), (1L, 2L, "dup")).toDF("src", "dst", "tag")
    val v = GraphStore.write(edges, root)
    assert(v === 1)
    val got = GraphStore.read(spark, root).as[(Long, Long, String)].collect().toSet
    assert(got.map(e => (e._1, e._2)) === Set((1L, 2L), (2L, 1L)))
  }

  test("upsert ignores existing (src, dst) pairs and appends new ones") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "orig")).toDF("src", "dst", "tag"), root)
    val v2 = GraphStore.upsert(spark, root,
      Seq((1L, 2L, "CLOBBER"), (2L, 3L, "new")).toDF("src", "dst", "tag"))
    assert(v2 === 2)
    val got = GraphStore.read(spark, root).as[(Long, Long, String)].collect().toSet
    // existing edge kept its original attributes (INSERT OR IGNORE)
    assert(got === Set((1L, 2L, "orig"), (2L, 3L, "new")))
    // previous snapshot still readable (immutable versions)
    assert(GraphStore.latestVersion(spark, root) === 2)
  }

  test("upsert is idempotent") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "x")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root, Seq((1L, 2L, "x")).toDF("src", "dst", "tag"))
    assert(GraphStore.read(spark, root).count() === 1)
  }

  test("readVersion time-travels and diff reports added/removed edges") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "a"), (2L, 3L, "b")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root, Seq((3L, 4L, "c")).toDF("src", "dst", "tag"))
    // v3 resets the store to a different edge set
    GraphStore.write(Seq((1L, 2L, "a2"), (9L, 9L, "z")).toDF("src", "dst", "tag"), root)

    assert(GraphStore.readVersion(spark, root, 1).count() === 2)
    assert(GraphStore.readVersion(spark, root, 2).count() === 3)

    val d12 = GraphStore.diff(spark, root, 1, 2)
      .as[(Long, Long, String)].collect().toSet
    assert(d12 === Set((3L, 4L, "added")))

    val d23 = GraphStore.diff(spark, root, 2, 3)
      .as[(Long, Long, String)].collect().toSet
    assert(d23 === Set((9L, 9L, "added"), (2L, 3L, "removed"), (3L, 4L, "removed")))
  }

  test("readers only see committed snapshots: uncommitted and foreign dirs are ignored") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "a")).toDF("src", "dst", "tag"), root)
    // simulate a failed/in-flight write (no _SUCCESS) and foreign junk
    val fs = new java.io.File(root)
    new java.io.File(fs, "v=2").mkdirs() // partial write, never committed
    new java.io.File(fs, "v=old").mkdirs() // manual backup junk
    new java.io.File(fs, ".staging-v9-zzz").mkdirs() // abandoned staging
    assert(GraphStore.latestVersion(spark, root) === 1)
    assert(GraphStore.read(spark, root).count() === 1)
    // the next commit SKIPS the dead v=2 slot instead of colliding
    // with it forever: the store stays writable after a crashed write
    val v = GraphStore.upsert(spark, root, Seq((5L, 6L, "b")).toDF("src", "dst", "tag"))
    assert(v === 3)
    assert(GraphStore.latestVersion(spark, root) === 3)
    assert(GraphStore.read(spark, root).count() === 2)
    // the dead slot is not readable as a snapshot
    intercept[IllegalArgumentException] {
      GraphStore.readVersion(spark, root, 2)
    }
  }

  test("two writers racing the same version: one commits, one fails actionably, store stays consistent") {
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, CyclicBarrier}
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "base")).toDF("src", "dst", "tag"), root)
    // both writers start together, so both resolve next version = 2
    // before either finishes its staging write — the rename race the
    // commit protocol exists for
    val barrier = new CyclicBarrier(2)
    val done = new CountDownLatch(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Int]]()
    def writer(name: String, delta: (Long, Long, String)): Thread = {
      val t = new Thread(() => {
        try {
          barrier.await()
          results.put(name, Right(GraphStore.upsert(spark, root,
            Seq(delta).toDF("src", "dst", "tag"))))
        } catch { case e: Throwable => results.put(name, Left(e)) }
        finally done.countDown()
      })
      t.start(); t
    }
    writer("a", (3L, 4L, "wa"))
    writer("b", (5L, 6L, "wb"))
    done.await()
    val (wins, losses) = results.values().toArray.toSeq
      .map(_.asInstanceOf[Either[Throwable, Int]]).partition(_.isRight)
    // at least one writer must land; a loser (if the race actually
    // collided — it does, staging writes take far longer than the
    // version probe) must fail with the actionable concurrent-commit
    // error, never silently clobber
    assert(wins.nonEmpty)
    losses.foreach { l =>
      val e = l.swap.toOption.get
      assert(e.isInstanceOf[IllegalStateException] &&
        e.getMessage.contains("concurrent GraphStore commit"),
        s"loser must fail actionably, got: $e")
    }
    // the store is readable and consistent: the committed snapshot(s)
    // contain the base edge plus each winner's delta
    val latest = GraphStore.latestVersion(spark, root)
    assert(latest >= 2)
    val got = GraphStore.read(spark, root).as[(Long, Long, String)].collect().toSet
    assert(got.contains((1L, 2L, "base")))
    assert(got.size === 1 + wins.size)
    // a defeated writer's RETRY (the error message's instruction)
    // succeeds and lands on a fresh version
    if (losses.nonEmpty) {
      val v = GraphStore.upsert(spark, root, Seq((7L, 8L, "retry")).toDF("src", "dst", "tag"))
      assert(v > latest)
      assert(GraphStore.read(spark, root).count() === got.size + 1)
    }
  }

  test("compact (round-13): read-equivalence for every version, diff stability, store stays writable") {
    import spark.implicits._
    val root = tmpRoot()
    // v1 write, v2 upsert (adds), v3 reset (removes + re-adds with
    // changed attrs), v4 upsert — exercises presence runs that break
    // and restart and attrs that change across a reset
    val v1 = GraphStore.write(Seq((1L, 2L, "a"), (2L, 3L, "b")).toDF("src", "dst", "tag"), root)
    val v2 = GraphStore.upsert(spark, root, Seq((3L, 4L, "c")).toDF("src", "dst", "tag"))
    val v3 = GraphStore.write(Seq((1L, 2L, "a2"), (5L, 6L, "d")).toDF("src", "dst", "tag"), root)
    val v4 = GraphStore.upsert(spark, root, Seq((2L, 3L, "b2")).toDF("src", "dst", "tag"))
    def snap(v: Int): Set[(Long, Long, String)] =
      GraphStore.readVersion(spark, root, v).as[(Long, Long, String)].collect().toSet
    def diffRows(a: Int, b: Int): Set[(Long, Long, String)] =
      GraphStore.diff(spark, root, a, b).as[(Long, Long, String)].collect().toSet
    val before = Seq(v1, v2, v3, v4).map(v => v -> snap(v)).toMap
    val diffsBefore = Seq((v1, v2), (v2, v3), (v1, v4)).map { case (a, b) =>
      (a, b) -> diffRows(a, b) }.toMap
    // a reader holding a LAZY plan across the whole maintenance pass:
    // compact must never pull files out from under it (round-13
    // review — the OPTIMIZE/VACUUM split)
    val held = GraphStore.read(spark, root)
    val rolled = GraphStore.compact(spark, root)
    assert(rolled === 4, "four snapshot versions should have been rolled")
    // compact deletes nothing: directories survive, the held plan
    // still executes, and dir copies win over the interval slice
    assert(Files.exists(java.nio.file.Paths.get(root, s"v=$v4")))
    assert(held.as[(Long, Long, String)].collect().toSet === before(v4))
    // time travel bit-identical (still via dirs here)
    assert(GraphStore.committedVersions(spark, root) === Seq(v1, v2, v3, v4))
    assert(GraphStore.latestVersion(spark, root) === v4)
    Seq(v1, v2, v3, v4).foreach(v => assert(snap(v) === before(v), s"v=$v diverged"))
    // re-compacting with nothing new is a no-op
    assert(GraphStore.compact(spark, root) === 0)
    // VACUUM reclaims the rolled directories; reads now route through
    // the interval slice and stay bit-identical
    assert(GraphStore.vacuum(spark, root) === 4)
    assert(!Files.exists(java.nio.file.Paths.get(root, s"v=$v4")))
    assert(GraphStore.committedVersions(spark, root) === Seq(v1, v2, v3, v4))
    Seq(v1, v2, v3, v4).foreach(v => assert(snap(v) === before(v), s"v=$v diverged post-vacuum"))
    diffsBefore.foreach { case ((a, b), want) =>
      assert(diffRows(a, b) === want, s"diff($a, $b) diverged") }
    assert(GraphStore.read(spark, root).as[(Long, Long, String)].collect().toSet === before(v4))
    // a rolled version number is never re-issued, and the store keeps
    // accepting upserts on top of the compacted history
    val v5 = GraphStore.upsert(spark, root, Seq((7L, 8L, "e")).toDF("src", "dst", "tag"))
    assert(v5 === v4 + 1)
    assert(snap(v5) === before(v4) + ((7L, 8L, "e")))
    assert(snap(v2) === before(v2)) // history still intact after new writes
    // a SECOND compact+vacuum rolls the new dir plus the old compact
    assert(GraphStore.compact(spark, root) === 2)
    assert(GraphStore.vacuum(spark, root) === 2)
    assert(GraphStore.committedVersions(spark, root) === Seq(v1, v2, v3, v4, v5))
    Seq(v1, v3, v5).foreach(v => assert(snap(v) === (if (v == v5) before(v4) + ((7L, 8L, "e")) else before(v))))
    // a version that never existed stays unreadable through the manifest
    val ex = intercept[IllegalArgumentException] {
      GraphStore.readVersion(spark, root, 99).collect()
    }
    assert(ex.getMessage.contains("no committed snapshot"))
    // a foreign c=N-k-shaped entry without a readable manifest is
    // ignored, never a store-wide poison (round-13 review) — even
    // though its NAME outranks the real compaction: coverage comes
    // from manifests, so reads still route, compact stays a no-op,
    // and vacuum neither stalls on it nor DELETES it (unknown
    // contents are not provably redundant)
    val junk = java.nio.file.Paths.get(root, "c=99-0")
    Files.createDirectories(junk)
    Files.createFile(junk.resolve("_SUCCESS"))
    assert(GraphStore.committedVersions(spark, root) === Seq(v1, v2, v3, v4, v5))
    assert(snap(v5) === before(v4) + ((7L, 8L, "e")))
    assert(GraphStore.compact(spark, root) === 0)
    assert(GraphStore.vacuum(spark, root) === 0)
    assert(Files.exists(junk), "vacuum must never delete unknown-coverage directories")
    // ...and new history keeps flowing around it
    val v6 = GraphStore.upsert(spark, root, Seq((9L, 9L, "f")).toDF("src", "dst", "tag"))
    assert(v6 === v5 + 1 && GraphStore.compact(spark, root) === 2)
    assert(GraphStore.vacuum(spark, root) === 2 && Files.exists(junk))
    assert(snap(v2) === before(v2))
  }

  test("upsert writes a DELTA snapshot: only new rows on disk, _PARENT names the base") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "a"), (2L, 3L, "b")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root,
      Seq((1L, 2L, "CLOBBER"), (3L, 4L, "c"), (3L, 4L, "c-dup")).toDF("src", "dst", "tag"))
    // the v=2 directory holds ONLY the surviving new row — the
    // existing edge was never rewritten, the within-delta duplicate
    // was deduped writer-side
    val raw = spark.read.parquet(s"$root/v=2").as[(Long, Long, String)].collect().toSet
    assert(raw === Set((3L, 4L, "c")))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "v=2", "_PARENT")).trim === "1")
    // the composed read is the full store
    assert(GraphStore.readVersion(spark, root, 2).as[(Long, Long, String)]
      .collect().toSet === Set((1L, 2L, "a"), (2L, 3L, "b"), (3L, 4L, "c")))
  }

  test("diff walks an unbroken delta chain without touching the base snapshot") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "a")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root, Seq((2L, 3L, "b")).toDF("src", "dst", "tag"))
    GraphStore.upsert(spark, root, Seq((3L, 4L, "c")).toDF("src", "dst", "tag"))
    // v1 -> v3 crosses two chained deltas: all added, nothing removed
    assert(GraphStore.diff(spark, root, 1, 3).as[(Long, Long, String)].collect().toSet
      === Set((2L, 3L, "added"), (3L, 4L, "added")))
    assert(GraphStore.diff(spark, root, 2, 3).as[(Long, Long, String)].collect().toSet
      === Set((3L, 4L, "added")))
    // reverse direction has no chain: the general path reports removals
    assert(GraphStore.diff(spark, root, 3, 1).as[(Long, Long, String)].collect().toSet
      === Set((2L, 3L, "removed"), (3L, 4L, "removed")))
  }

  test("attribute-less edge sets dedup by set semantics (write and upsert)") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), root)
    assert(GraphStore.read(spark, root).as[(Long, Long)].collect().toSet
      === Set((1L, 2L), (2L, 3L)))
    GraphStore.upsert(spark, root, Seq((1L, 2L), (3L, 4L), (3L, 4L)).toDF("src", "dst"))
    assert(spark.read.parquet(s"$root/v=2").as[(Long, Long)].collect().toSet
      === Set((3L, 4L)))
    assert(GraphStore.read(spark, root).as[(Long, Long)].collect().toSet
      === Set((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("null edge keys keep INSERT-OR-IGNORE semantics through delta upserts") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((Some(1L), Some(2L), "a"), (None, Some(5L), "n"))
      .toDF("src", "dst", "tag"), root)
    // re-upserting the null-keyed edge must NOT re-insert it (the
    // null-safe anti-join — a plain key join would append it forever)
    GraphStore.upsert(spark, root,
      Seq((None: Option[Long], Some(5L), "n2")).toDF("src", "dst", "tag"))
    assert(spark.read.parquet(s"$root/v=2").count() === 0)
    GraphStore.upsert(spark, root,
      Seq((None: Option[Long], Some(6L), "new")).toDF("src", "dst", "tag"))
    val got = GraphStore.read(spark, root)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2))).toSet
    assert(got === Set((Some(1L), Some(2L), "a"), (None, Some(5L), "n"),
      (None, Some(6L), "new")))
  }

  test("diff's general path matches null-keyed edges null-safely (chain parity)") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((Some(1L), Some(2L), "a"), (None, Some(5L), "n"),
      (Some(7L), None, "m")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root,
      Seq((Some(3L), Some(4L), "b")).toDF("src", "dst", "tag"))
    def diffSet(fromV: Int, toV: Int): Set[(Option[Any], Option[Any], String)] =
      GraphStore.diff(spark, root, fromV, toV)
        .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2))).toSet
    // forward rides the delta chain: the null-keyed edges (unchanged)
    // are silent and only the upserted edge appears
    assert(diffSet(1, 2) === Set((Option(3L): Option[Any], Option(4L): Option[Any], "added")))
    // reverse has no chain — the general full-outer path must AGREE: a
    // plain-equality join would never match (null, 5) or (7, null)
    // against themselves and emit each as both 'added' and 'removed'
    assert(diffSet(2, 1) === Set((Option(3L): Option[Any], Option(4L): Option[Any], "removed")))
  }

  test("dedup survivor within one input is deterministic across reruns") {
    import spark.implicits._
    val dup = Seq((1L, 2L, "zz"), (1L, 2L, "aa"), (3L, 4L, "c")).toDF("src", "dst", "tag")
    val r1 = tmpRoot(); val r2 = tmpRoot()
    GraphStore.write(dup, r1)
    GraphStore.write(dup.repartition(7), r2) // different physical order
    val a = GraphStore.read(spark, r1).as[(Long, Long, String)].collect().toSet
    val b = GraphStore.read(spark, r2).as[(Long, Long, String)].collect().toSet
    assert(a === b)
    assert(a.contains((1L, 2L, "aa"))) // total order picks the same attrs
  }
}
