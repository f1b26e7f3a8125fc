package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Per-round benchmark: every SparkEntry query timed at the driver's
  * scale factor; one full JSON line + one compact JSON line on stdout.
  *
  * Methodology (so numbers survive scrutiny):
  *   - one untimed warmup pass per query at sf0.001 (falls back to the
  *     bench dir) pays session init, classloading and whole-stage
  *     codegen compilation OUTSIDE the timed region;
  *   - timed runs materialize every result row via the `noop` sink —
  *     the full projected result is computed (unlike `.count()`, which
  *     lets Catalyst prune the plan down to an agg-of-agg);
  *   - each query is timed `--reps` times (default 3) and the MEDIAN
  *     reported: round 6 proved single-shot (and best-of-2) timings on
  *     a shared box swing ±20-65% with machine load — a committed
  *     6.1 s g_ktruss re-measured at 9.3 s in a rerun where EVERY key
  *     was uniformly +19%. The median of 3 absorbs one outlier run per
  *     key; the full per-rep sample ledger lands in BENCH_LOCAL.json
  *     so any per-key delta can be checked against its own spread;
  *   - a fixed LOAD SENTINEL (a scale-independent hash+groupBy over
  *     spark.range) is timed before and after the suite: two inflated
  *     sentinel readings mean the whole run is load-skewed and its
  *     absolute numbers should not be compared across rounds;
  *   - the run is GATED on a per-key LIGHT sentinel (round-12, verdict
  *     #1: driver runs diverged 14% from the committed record on
  *     identical code under evening box load, forcing per-key
  *     adjudication): a ~0.1 s scale-independent probe is timed
  *     immediately before each key's rep block, compared against a
  *     quiet-box reference (the committed record's `light_ref`, else
  *     this run's own 25th-percentile probe — NOT the minimum, which
  *     over 170+ probes is one lucky moment well below the probe's
  *     structural full-suite floor), and every key measured under a
  *     drifted sentinel is RE-MEASURED once after the suite — the
  *     measurement with the quieter sentinel wins. Keys still drifted
  *     after the retry are listed in `drifted` (ledger AND compact
  *     tail), so a load-skewed artifact names its own skewed keys
  *     instead of needing narrative adjudication. If more than half
  *     the keys drift, the whole run is load-skewed: retries are
  *     skipped (they would thrash, not heal) and `run_skewed` is set;
  *   - the STREAMING HARNESS FLOOR — a stateless projection pushed
  *     through the same StreamReplay chunked micro-batch machinery —
  *     is timed after the suite: every e_stream key's time is
  *     (operator + harness), so key_time − floor estimates the
  *     operator's own share (the replay machinery is a verification
  *     harness, not a production cost — see StreamReplay's scaladoc);
  *   - a FAILING rep is excluded (time-to-failure is not a
  *     measurement) with the error on stderr; a key with no successful
  *     rep reports -1 and is excluded from the total. Only NonFatal
  *     errors are caught — an OOM should kill the bench, not corrupt
  *     the next measurement.
  *
  * Output contract: line 1 is the driver's full ledger (metric/value/
  * unit/queries/sf, per-key medians). The LAST line is a compact
  * summary sized under the driver's 2000-char stdout-tail capture so
  * the round artifact ALWAYS parses, with the budget spent on per-key
  * adjudication (round-13, verdict #4): core stats + per-pack sums +
  * [rep1, median] memoized-key report, then greedily the drifted-key
  * probe profile (worst first, `n_drifted` marking completeness),
  * the full per-key medians when the run is small enough to fit
  * (every dev/filtered run is self-contained), else the widest
  * slowest-K that fits. BENCH_LOCAL.json carries line 1 plus the
  * per-rep samples.
  */
object Bench {
  import Measure.{materialize, median, ms}

  /** Minimal JSON string escape (same classes Verify escapes). */
  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = "32")

    val warmDir = {
      val small = new java.io.File("/root/testdata/sf0.001")
      if (small.isDirectory) small.getPath else sfDir
    }
    // args: optional `--reps N`, remaining tokens restrict to those
    // query names (dev loop; the driver invokes with no args = full
    // suite at 3 reps)
    val (reps, only) = {
      val i = args.indexOf("--reps")
      if (i >= 0 && i + 1 < args.length)
        (args(i + 1).toInt, (args.take(i) ++ args.drop(i + 2)).toSet)
      else (3, args.toSet)
    }
    require(reps >= 1, s"--reps must be >= 1, got $reps")
    val queries = SparkEntry.queries
    val names = queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))

    def cooldown(): Unit = {
      // Queries are independent; drop persisted blocks so one query's
      // cache never skews (or starves) a later measurement, and nudge
      // the ContextCleaner so localCheckpoint blocks from iterative
      // queries (BFS/PageRank) are actually reclaimed.
      spark.catalog.clearCache()
      System.gc()
    }
    def timeIt(run: () => Unit, label: String): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { run(); true }
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] $label FAILED: ${e.getMessage}")
          false
        }
      val t = (System.nanoTime() - t0) / 1e9
      cooldown()
      if (ok) Some(t) else None
    }

    // fixed, scale-independent load sentinel: pure codegen'd hash +
    // one bounded-key shuffle — the machine's throughput, not the
    // engine's. Timed before AND after the suite.
    def sentinel(): Double = {
      import spark.implicits._
      timeIt(() => materialize(
        spark.range(20L * 1000 * 1000)
          .select(pmod(hash($"id"), lit(9973)).as("k"), $"id")
          .groupBy($"k").agg(count(lit(1)).as("n"), sum($"id").as("s"))),
        "load-sentinel").getOrElse(-1.0)
    }

    names.foreach { name =>
      try materialize(queries(name)(spark, warmDir))
      catch { case NonFatal(_) => () }
      cooldown()
    }
    // the replay feed's one-time chunk staging for the BENCH dir is a
    // warmup cost, not the first stream key's rep-1 cost (warmup runs
    // at warmDir, so without this the staging lands inside the
    // alphabetically-first replay-backed key's timed rep). Registry-
    // driven, not name-prefix-driven: a replay-backed key can be
    // named anything.
    val replayKeys = SparkEntry.replayBackedKeys
    if (names.exists(replayKeys))
      try graft.streaming.StreamReplay.prepare(spark, sfDir)
      catch { case NonFatal(e) => System.err.println(s"[bench] prestage: ${e.getMessage}") }

    // light per-key load sentinel: the bookend sentinel's shape at
    // ~1/5 the rows, ~0.1 s — cheap enough to run 2×173 times, load-
    // sensitive enough to catch the 1.4×+ evening drift that forced
    // per-key adjudication in rounds 10–11. No cooldown (it allocates
    // next to nothing, and a GC per probe would dominate the probe).
    def lightSentinel(): Double = {
      import spark.implicits._
      val t0 = System.nanoTime()
      try materialize(
        spark.range(4L * 1000 * 1000)
          .select(pmod(hash($"id"), lit(9973)).as("k"), $"id")
          .groupBy($"k").agg(count(lit(1)).as("n"), sum($"id").as("s")))
      catch { case NonFatal(_) => () }
      (System.nanoTime() - t0) / 1e9
    }
    // the committed record, read once for both the light_ref and the
    // record-SF guard below (one path/charset/error policy to keep in
    // sync). Absent and unreadable stay DISTINGUISHED: an absent
    // record may be freely created, an unreadable one must divert the
    // write to /tmp — its sf can't be checked, and a wrong-SF
    // overwrite would clobber the regression record.
    val (recordAbsent: Boolean, priorRecord: Option[String]) =
      try {
        val f = java.nio.file.Paths.get("BENCH_LOCAL.json")
        if (!java.nio.file.Files.exists(f)) (true, None)
        else (false, Some(new String(java.nio.file.Files.readAllBytes(f),
          java.nio.charset.StandardCharsets.UTF_8)))
      } catch { case NonFatal(e) =>
        System.err.println(s"[bench] record read failed (${e.getMessage}) — diverting")
        (false, None)
      }
    // quiet-box reference: the committed record's own light_ref when
    // one exists (cross-run comparability is the whole point: the
    // record was measured on a quiet box), floored by this run's p25
    // probe in case the box got FASTER.
    val priorLightRef: Option[Double] =
      priorRecord.flatMap(""""light_ref":([0-9.eE+-]+)""".r
        .findFirstMatchIn(_).map(_.group(1).toDouble))

    def measureKey(name: String): (Double, Seq[Double]) = {
      val sent = lightSentinel()
      val xs = (1 to reps).flatMap(_ =>
        timeIt(() => materialize(queries(name)(spark, sfDir)), name))
      (sent, xs)
    }

    lightSentinel(): Unit // warm: the first probe otherwise pays codegen
    val sentinelStart = sentinel()
    val firstPass: Seq[(String, (Double, Seq[Double]))] =
      names.map(name => name -> measureKey(name))
    val sentinelEnd = sentinel()

    // robust in-run quiet reference: the 25th-percentile probe, NOT
    // the minimum — over a 170-key suite the min is one lucky
    // scheduling moment ~1.7× below the probe's structural full-suite
    // floor (every probe carries the previous key's trailing GC/cache
    // state; round-12 calibration on a quiet box: min 0.33, median
    // 0.56, p90 0.66 — a min-referenced threshold flagged half the
    // suite). p25 tracks the floor robustly on full suites and
    // degrades toward the min on small dev runs, where probes are few
    // and uncontaminated. NEAREST-RANK p25 (sorted index n/4), not
    // interpolated: on 2–3-key dev runs that index IS the minimum and
    // at 4 keys the 2nd-smallest — acceptable per the dev-run
    // degradation above, but read `light_ref` with that convention.
    val runRefSent = {
      val sents = firstPass.map(_._2._1).sorted
      if (sents.isEmpty) 0.0 else sents(sents.size / 4)
    }
    val lightRef = priorLightRef.fold(runRefSent)(math.min(_, runRefSent))
    // 1.4× the quiet reference + a 50 ms absolute cushion (job-launch
    // jitter dominates at the probe's size)
    val driftThr = lightRef * 1.4 + 0.05
    val flaggedFirst = firstPass.collect {
      case (n, (s, _)) if s > driftThr => n
    }
    val runSkewed = flaggedFirst.size > names.size / 2
    // retry pass: each drifted key re-measured ONCE after the suite
    // (transient load has usually passed by then); skipped when the
    // whole run is skewed — retrying 173 keys under sustained load
    // thrashes without healing, the run-level flag is the honest
    // answer there
    val retried: Map[String, (Double, Seq[Double])] =
      if (runSkewed) Map.empty
      else flaggedFirst.map(n => n -> measureKey(n)).toMap
    // per key, the measurement taken under the quieter sentinel wins
    val chosen: Seq[(String, Double, Seq[Double])] = firstPass.map {
      case (n, (s1, xs1)) =>
        retried.get(n) match {
          case Some((s2, xs2)) if s2 < s1 && xs2.nonEmpty => (n, s2, xs2)
          case _ => (n, s1, xs1)
        }
    }
    val samples: Seq[(String, Seq[Double])] =
      chosen.map { case (n, _, xs) => n -> xs }
    val drifted = chosen.collect { case (n, s, _) if s > driftThr => n }

    // streaming harness floor: the cheapest possible pipeline (a
    // stateless projection, no state store) through the identical
    // chunked replay — measured at the SAME reps/median protocol,
    // only when stream keys were benched
    val streamFloor: Double =
      if (!names.exists(replayKeys)) -1.0
      else {
        import org.apache.spark.sql.streaming.OutputMode
        val fs = (1 to reps).flatMap(_ => timeIt(() => materialize(
          graft.streaming.StreamReplay.replay(spark, sfDir, mode = OutputMode.Append())(
            ds => ds.toDF().select(col("event_id"), col("user_id")))(
            out => out.filter(col("user_id") =!= graft.streaming.StreamReplay.SENTINEL_USER))),
          "stream-floor"))
        if (fs.nonEmpty) median(fs) else -1.0
      }

    val results = samples.map { case (n, xs) =>
      n -> (if (xs.nonEmpty) median(xs) else -1.0)
    }
    val qs = results.map { case (k, v) => jsonStr(k) + ":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // per-key OPERATOR share for the streaming keys: median − harness
    // floor, clamped at 0 (every e_stream key pays the same chunked
    // replay machinery; subtracting the measured floor makes streaming
    // OPERATOR optimizations visible across rounds instead of being
    // buried under the constant harness cost). e_stream_ingest runs
    // its own heavier file-landing harness, so its share vs the
    // replay floor is an upper bound — still comparable round-over-
    // round, which is what the ledger is for.
    val streamShare = results
      .filter { case (k, v) => replayKeys(k) && v >= 0 && streamFloor >= 0 }
      .map { case (k, v) => jsonStr(k) + ":" + ms(math.max(0.0, v - streamFloor)) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":${jsonStr(sfDir)}}"""
    println(line)

    // full ledger (medians + every raw sample) — the committed
    // regression record; the driver's stdout tail is lossy past
    // ~2000 chars, this file never is
    val sampleJson = samples.map { case (k, xs) =>
      jsonStr(k) + ":[" + xs.map(ms).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val keySentJson = chosen
      .map { case (n, s, _) => jsonStr(n) + ":" + ms(s) }
      .mkString("{", ",", "}")
    val driftedJson = drifted.map(jsonStr).mkString("[", ",", "]")
    val retriedJson = retried.keys.toSeq.sorted.map(jsonStr).mkString("[", ",", "]")
    val ledger =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","reps":$reps,""" +
        s""""sentinel_sec":[${ms(sentinelStart)},${ms(sentinelEnd)}],""" +
        s""""light_ref":${ms(runRefSent)},"drift_thr":${ms(driftThr)},""" +
        s""""run_skewed":$runSkewed,"drifted":$driftedJson,"retried":$retriedJson,""" +
        s""""key_sentinels":$keySentJson,""" +
        s""""stream_floor_sec":${ms(streamFloor)},"stream_share":$streamShare,""" +
        s""""queries":$qs,"samples":$sampleJson,"sf":${jsonStr(sfDir)}}"""
    // BENCH_LOCAL.json is the COMMITTED regression record (full suite,
    // >= 3-rep medians, record SF): a filtered, single-rep, or
    // different-SF dev-loop run must never clobber it (round-7 advice
    // item). The record SF is self-describing — the existing record's
    // own "sf" field; a run at any other SF spills to /tmp instead,
    // unless SPARK_GRAFT_BENCH_OUT names a target explicitly.
    // lazy + guarded: the read only happens when no explicit target
    // overrides it, and an unreadable record must divert to /tmp, not
    // crash the whole measured suite after the fact
    def recordSfMatches: Boolean =
      recordAbsent || priorRecord.exists(_.contains(s""""sf":${jsonStr(sfDir)}"""))
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT").getOrElse(
      if (only.isEmpty && reps >= 3 && recordSfMatches) "BENCH_LOCAL.json"
      else "/tmp/graft_bench_dev.json")
    System.err.println(s"[bench] ledger -> $outPath")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath).toAbsolutePath,
      (ledger + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case NonFatal(e) => System.err.println(s"[bench] file write failed: ${e.getMessage}") }

    // compact summary LAST, sized under the driver's 2000-char stdout
    // tail: parseable round artifact even without BENCH_LOCAL.json
    val packs = results.filter(_._2 >= 0)
      .groupBy(_._1.take(1))
      .toSeq.sortBy(_._1)
      .map { case (p, rs) => jsonStr(p) + ":" + ms(rs.map(_._2).sum) }
      .mkString("{", ",", "}")
    // memoized keys (SessionCache or any other intra-suite reuse) pay
    // their compute on rep 1 and read a cache on reps 2+, so the
    // MEDIAN under-reports what the key costs cold; surface
    // [rep1, median] for every key whose first rep dwarfs its median
    // so compute cost stays visible across rounds without parsing the
    // ledger. Data-driven (not a static key list): any memoization
    // source qualifies, and a non-memoized key only appears under a
    // one-off scheduling hiccup — which [rep1, median] reports
    // honestly too. Top 15 by gap keeps the tail under the driver's
    // 2000-char capture.
    // only keys where EVERY rep succeeded: timeIt drops failed reps,
    // so with a failure xs.head would be the first SUCCESSFUL rep —
    // a warm rep-2 mislabeled as the cold cost.
    // FIRST-PASS samples, not the retry-chosen ones: a memoized key's
    // drift retry runs with the intra-suite cache already built, so
    // its rep 1 is warm — swapping it in would erase the cold-build
    // cost this report exists to keep visible (second review pass).
    // The MEDIAN honesty is unaffected (warm medians are what the
    // ledger reports for memoized keys either way).
    val rep1Gap = firstPass
      .map { case (k, (_, xs)) => (k, xs) }
      .collect { case (k, xs) if xs.length == reps =>
        (k, xs.head, median(xs)) }
      .filter { case (_, r1, med) => r1 >= 2 * med && r1 - med >= 0.3 }
      .sortBy { case (_, r1, med) => med - r1 }
      .take(15)
      .map { case (k, r1, med) => jsonStr(k) + s":[${ms(r1)},${ms(med)}]" }
      .mkString("{", ",", "}")
    /** Capped JSON name array with a "+N more" truncation marker —
      * ONE definition for `failed` and `drifted` so the cap and
      * marker format cannot desynchronize. An unbounded list here
      * could push the final line past the capture on exactly the run
      * whose artifact most needs to parse (round-13 review). */
    def cappedNames(xs: Seq[String]): String =
      (xs.take(12).map(jsonStr) ++
        (if (xs.size > 12) Seq(jsonStr(s"+${xs.size - 12} more")) else Nil))
        .mkString("[", ",", "]")
    val allFailed = results.collect { case (k, v) if v < 0 => k }
    val failed = cappedNames(allFailed)
    // ---- budgeted compact tail (round-13, verdict #4): the driver
    // captures the LAST ~2000 stdout chars and parses the final line,
    // so the line must stay under that capture — but within it, spend
    // the budget on PER-KEY ADJUDICATION data instead of fixed caps:
    //   - `drift_probes` carries the drifted-key → probe profile
    //     (2-decimal; adjudicate vs `drift_thr` = light_ref·1.4+0.05),
    //     worst offenders first, as many as fit — `n_drifted` in the
    //     core says whether the profile is complete (the r12
    //     artifact's "+88 more" blind spot is what this replaces; a
    //     fully-skewed run's ~100-key profile cannot physically fit
    //     the capture, but there `run_skewed` IS the adjudication and
    //     the committed BENCH_LOCAL.json carries the detail);
    //   - `queries` (the COMPLETE per-key medians) joins whenever the
    //     run is small enough to fit — every dev/filtered run's tail
    //     is then fully self-contained;
    //   - otherwise `slowest` grows to fill the leftover budget
    //     (≥ the old fixed 15 on a quiet full suite).
    // Greedy by that priority; nothing here can push the line past
    // the capture, so the final line ALWAYS parses.
    val tailBudget = 1900
    val driftedTail = cappedNames(drifted)
    val core =
      s""""metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},""" +
        s""""reps":$reps,"sentinel_sec":[${ms(sentinelStart)},${ms(sentinelEnd)}],""" +
        s""""light_ref":${ms(runRefSent)},"drift_thr":${ms(driftThr)},""" +
        s""""run_skewed":$runSkewed,"n_drifted":${drifted.size},"drifted":$driftedTail,""" +
        s""""stream_floor_sec":${ms(streamFloor)},""" +
        s""""packs":$packs,"rep1_gap":$rep1Gap,""" +
        s""""n_failed":${allFailed.size},"failed":$failed,"sf":${jsonStr(sfDir)}"""
    var line2 = core
    def tryAdd(frag: String): Boolean = {
      val fits = line2.length + frag.length + 3 <= tailBudget
      if (fits) line2 += "," + frag
      fits
    }
    /** As many of `entries` as fit under the budget, as `"name":{…}`.
      * The per-entry estimate and tryAdd's exact arithmetic differ by
      * a separator, so on a failed add the prefix SHRINKS until it
      * fits instead of dropping the whole section; when not even one
      * entry fits, nothing is emitted (an empty `"name":{}` would
      * spend budget to say nothing) — round-14 ADVICE. */
    def greedy(name: String, entries: Seq[String]): Boolean = {
      var used = line2.length + s""","$name":{}""".length + 1
      var k = 0
      while (k < entries.length && used + entries(k).length + 1 <= tailBudget) {
        used += entries(k).length + 1; k += 1
      }
      while (k > 0 &&
        !tryAdd(s""""$name":${entries.take(k).mkString("{", ",", "}")}""")) k -= 1
      k > 0
    }
    val probeByKey = chosen.map { case (n, s, _) => n -> s }.toMap
    // probes through the locale-pinned Measure.ms — an f"%.2f" here
    // would emit comma decimals (invalid JSON) on comma locales, the
    // exact bug ms exists to prevent (round-13 review)
    if (drifted.nonEmpty)
      greedy("drift_probes", drifted.sortBy(-probeByKey(_))
        .map(n => jsonStr(n) + ":" + ms(probeByKey(n))))
    tryAdd(s""""stream_share":$streamShare"""): Unit
    if (!tryAdd(s""""queries":$qs"""))
      greedy("slowest", results.filter(_._2 >= 0).sortBy(-_._2)
        .map { case (k, v) => jsonStr(k) + ":" + ms(v) }): Unit
    println("{" + line2 + "}")
    spark.stop()
  }
}
