package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Measured proof of the z-order layout payoff: the SAME selective
  * predicate reads a fraction of the bytes off a z-clustered table
  * that it reads off a single-column-sorted one, because every
  * z-file's parquet stats bound BOTH dimensions. The comparison is
  * deliberately adversarial to the baseline's favor: the baseline is
  * sorted by l_partkey, and the probe filters on l_suppkey — the
  * dimension a 1-D layout spreads uniformly over every file, so its
  * row-group stats prune nothing, while the z-layout's 16 files
  * each cover ~a quarter of the suppkey domain. Also asserts the
  * probe ANSWER is identical on both layouts (layout is metadata,
  * never semantics) and that the zkey bit math matches a plain-Scala
  * reference interleave. */
class ZOrderLayoutSpec extends SparkSpec {

  /** Total task input bytesRead during `action` (shared listener +
    * quiesce accounting in [[graft.TestMetrics]]). */
  private def bytesRead(action: => Unit): Long =
    graft.TestMetrics.taskMetricSum(spark)(_.inputMetrics.bytesRead)(action)

  test("zkey interleave matches a plain-Scala reference bit-for-bit") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until ZOrder.BITS).map(i => ((x & (1L << i)) << i) | ((y & (1L << i)) << (i + 1))).reduce(_ | _)
    val probe = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1999L, 99L), (123456789L, 987654321L),
      ((1L << 31) - 1, (1L << 31) - 1))
    val got = probe.toDF("x", "y")
      .select($"x", $"y", ZOrder.interleave($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    probe.foreach { case (x, y) =>
      assert(got((x, y)) === ref(x, y), s"interleave($x, $y)")
      assert(got((x, y)) >= 0, s"sign overflow at ($x, $y)")
    }
    // the domain guard is loud, not masking (scoped: only this
    // block's task failure is expected — the byte measurements below
    // stay under the silent-retry guard)
    val err = expectTaskFailures(intercept[Exception] {
      Seq((1L << 31, 0L)).toDF("x", "y").select(ZOrder.interleave($"x", $"y")).collect()
    })
    assert(err.getMessage.contains("zorder domain"), s"wrong guard error: ${err.getMessage}")
  }

  test("k-dim interleave matches a plain-Scala reference bit-for-bit (k = 3) and bounds the sign bit") {
    import spark.implicits._
    val k = 3
    val bits = ZOrder.bitsPerDim(k)
    assert(bits === 20)
    assert(ZOrder.bitsPerDim(2) === ZOrder.BITS, "k = 2 must reproduce the shipped 2-D layout")
    def ref(vs: Seq[Long]): Long =
      (for { i <- 0 until bits; j <- vs.indices } yield
        (vs(j) & (1L << i)) << (i * (k - 1) + j)).reduce(_ | _)
    val top = (1L << bits) - 1
    val probe = Seq(Seq(0L, 0L, 0L), Seq(1L, 0L, 0L), Seq(0L, 1L, 0L), Seq(0L, 0L, 1L),
      Seq(1999L, 99L, 7L), Seq(top, top, top))
    val got = probe.map(p => (p(0), p(1), p(2))).toDF("x", "y", "w")
      .select($"x", $"y", $"w", ZOrder.interleaveN(Seq($"x", $"y", $"w")).as("z"))
      .collect().map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    probe.foreach { p =>
      assert(got(p) === ref(p), s"interleaveN($p)")
      assert(got(p) >= 0, s"sign overflow at $p")
    }
    // octant monotonicity: clearing low bits of every coord never
    // increases the key (the property range pruning relies on)
    probe.foreach { p =>
      assert(ref(p.map(_ & ~31L)) <= ref(p), s"octant base above point at $p")
    }
    // the k-dim domain guard is loud at the SHRUNKEN per-dim bound
    val err = expectTaskFailures(intercept[Exception] {
      Seq((1L << bits, 0L, 0L)).toDF("x", "y", "w")
        .select(ZOrder.interleaveN(Seq($"x", $"y", $"w"))).collect()
    })
    assert(err.getMessage.contains("zorder domain"), s"wrong guard error: ${err.getMessage}")
  }

  test("a 3rd-dimension probe reads a fraction of the bytes off the 3-D z-layout vs the partkey-sorted layout") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val li = graft.Tables.lineitem(spark, sf01)
      .select($"l_partkey", $"l_suppkey", $"l_quantity".cast("long").as("l_quantity"))
    val root = graft.util.Scratch.dir("zorder3_layout")
    val linearPath = s"$root/linear"
    val zPath = s"$root/zorder3"
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linearPath)
    ZOrder.writeClusteredN(li.toDF(), Seq("l_partkey", "l_suppkey", "l_quantity"),
      zPath, files = 16)

    // probe the THIRD clustered dimension — invisible to the 1-D sort
    def probe(path: String): (Long, Long) = {
      val r = spark.read.parquet(path)
        .filter($"l_quantity".between(1L, 4L))
        .agg(count(lit(1)).as("n"), sum($"l_suppkey").as("s"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val ansLinear = probe(linearPath)
    val ansZ = probe(zPath)
    assert(ansZ === ansLinear, "layout changed the query answer")
    assert(ansLinear._1 > 100, s"probe too selective to be meaningful: ${ansLinear._1} rows")

    val bLinear = bytesRead(probe(linearPath))
    val bZ = bytesRead(probe(zPath))
    assert(bLinear > 0 && bZ > 0, s"vacuous: no input bytes measured ($bLinear, $bZ)")
    assert(bZ * 4 < bLinear * 3,
      s"3-D z-layout read $bZ B vs linear $bLinear B — expected a measurable " +
        "reduction: each z-file bounds the quantity domain at 20-bit resolution, " +
        "the partkey-sorted files all span it")
  }

  test("a suppkey probe reads a fraction of the bytes off the z-layout vs the partkey-sorted layout") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.01"
    val li = graft.Tables.lineitem(spark, sf01)
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val root = graft.util.Scratch.dir("zorder_layout")
    val linearPath = s"$root/linear"
    val zPath = s"$root/zorder"
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linearPath)
    ZOrder.writeClustered(li.toDF(), "l_partkey", "l_suppkey", zPath, files = 16)

    // the probe: a ~5%-wide range on the NON-sort dimension of the
    // baseline; collected answer must be layout-independent
    def probe(path: String): (Long, Double) = {
      val r = spark.read.parquet(path)
        .filter($"l_suppkey".between(40, 44))
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
        .collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    val ansLinear = probe(linearPath)
    val ansZ = probe(zPath)
    assert(ansZ === ansLinear, "layout changed the query answer")
    assert(ansLinear._1 > 100, s"probe too selective to be meaningful: ${ansLinear._1} rows")

    val bLinear = bytesRead(probe(linearPath))
    val bZ = bytesRead(probe(zPath))
    assert(bLinear > 0 && bZ > 0, s"vacuous: no input bytes measured ($bLinear, $bZ)")
    assert(bZ * 2 < bLinear,
      s"z-layout read $bZ B vs linear $bLinear B — row-group pruning not engaged " +
        "(expected well under half: each z-file bounds the suppkey domain, " +
        "the partkey-sorted files all span it)")
  }
}
