package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Fault-injection coverage for [[GraphStore]]'s damage rails —
  * separated from GraphStoreSpec because intentionally-corrupted
  * files make Spark tasks fail-and-retry, which the healthy suites'
  * no-silent-retries guard forbids. */
class GraphStoreFaultSpec extends SparkSpec {

  override protected def allowsTaskFailures: Boolean = true

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-store-fault").resolve("edges").toString

  /** Overwrite a file's bytes AND drop its Hadoop local-FS checksum
    * sibling, so the read fails on the CONTENT (the scenario under
    * test), not on a .crc mismatch. */
  private def damage(f: java.io.File, bytes: Array[Byte]): Unit = {
    Files.write(f.toPath, bytes)
    val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
    if (crc.exists()) crc.delete()
  }

  test("a corrupt _PARENT marker fails loudly instead of truncating the chain") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "a")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root, Seq((2L, 3L, "b")).toDF("src", "dst", "tag"))
    damage(new java.io.File(new java.io.File(root, "v=2"), "_PARENT"),
      "not-a-version".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      GraphStore.readVersion(spark, root, 2).collect()
    }
    assert(ex.getMessage.contains("corrupt _PARENT"))
  }

  test("a numeric-but-wrong _PARENT (self-pointer) fails loudly instead of spinning") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "a")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root, Seq((2L, 3L, "b")).toDF("src", "dst", "tag"))
    damage(new java.io.File(new java.io.File(root, "v=2"), "_PARENT"),
      "2".getBytes("UTF-8")) // self-pointer: would recurse forever
    val ex = intercept[IllegalStateException] {
      GraphStore.readVersion(spark, root, 2).collect()
    }
    assert(ex.getMessage.contains("not an older version"))
    // a forward pointer is equally corrupt
    damage(new java.io.File(new java.io.File(root, "v=2"), "_PARENT"),
      "9".getBytes("UTF-8"))
    val ex2 = intercept[IllegalStateException] {
      GraphStore.diff(spark, root, 1, 2).collect()
    }
    assert(ex2.getMessage.contains("not an older version"))
  }

  test("vacuum aborts on PARTIAL row loss: a deleted part file with readable survivors") {
    import spark.implicits._
    val root = tmpRoot()
    // enough distinct rows to span several part files
    GraphStore.write((1L to 64L).map(i => (i, i + 1000L, s"t$i"))
      .toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root,
      (65L to 96L).map(i => (i, i + 1000L, s"t$i")).toDF("src", "dst", "tag"))
    assert(GraphStore.compact(spark, root) === 2)
    // swap ONE part file for a VALID 0-row parquet of the identical
    // schema: every footer stays readable and every column is
    // present, so the round-14 readability probe alone would pass —
    // only the manifest-embedded publish-time row count can see the
    // loss (round 15)
    val cDir = new java.io.File(root).listFiles().find(_.getName.startsWith("c=")).get
    val parts = cDir.listFiles().filter(_.getName.endsWith(".parquet"))
    val victim = parts.maxBy(_.length)
    val emptyDir = Files.createTempDirectory("graft-empty-parquet").toString
    spark.read.parquet(cDir.toString).limit(0).coalesce(1)
      .write.mode("overwrite").parquet(emptyDir)
    val emptyPart = new java.io.File(emptyDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    damage(victim, Files.readAllBytes(emptyPart.toPath))
    assert(GraphStore.vacuum(spark, root) === 0,
      "vacuum must abort on a row-count mismatch, not delete the snapshots")
    // the snapshot directories survive and reads still work through them
    assert(GraphStore.readVersion(spark, root, 2).count() === 96L)
    // sanity: an undamaged compaction still vacuums (count matches)
    val root2 = tmpRoot()
    GraphStore.write((1L to 64L).map(i => (i, i + 1000L, s"t$i"))
      .toDF("src", "dst", "tag"), root2)
    GraphStore.upsert(spark, root2,
      (65L to 96L).map(i => (i, i + 1000L, s"t$i")).toDF("src", "dst", "tag"))
    assert(GraphStore.compact(spark, root2) === 2)
    assert(GraphStore.vacuum(spark, root2) === 2)
    assert(GraphStore.readVersion(spark, root2, 2).count() === 96L)
  }

  test("vacuum aborts when the covering compaction's data is unreadable") {
    import spark.implicits._
    val root = tmpRoot()
    GraphStore.write(Seq((1L, 2L, "a")).toDF("src", "dst", "tag"), root)
    GraphStore.upsert(spark, root, Seq((2L, 3L, "b")).toDF("src", "dst", "tag"))
    assert(GraphStore.compact(spark, root) === 2)
    // damage the compaction parquet while its _MANIFEST survives — the
    // exact scenario where a manifest-trusting vacuum would become
    // permanent data loss (round-14 ADVICE)
    val cDir = new java.io.File(root).listFiles().find(_.getName.startsWith("c=")).get
    cDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => damage(f, Array.fill(16)(0x5a.toByte)))
    assert(GraphStore.vacuum(spark, root) === 0, "vacuum must abort, not delete")
    // the snapshot directories survive and reads still work through them
    assert(GraphStore.readVersion(spark, root, 2).as[(Long, Long, String)]
      .collect().toSet === Set((1L, 2L, "a"), (2L, 3L, "b")))
  }
}
