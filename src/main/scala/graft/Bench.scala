package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional args: query names restrict the run (dev loop; the driver
    // passes none and gets the full suite)
    val only = args.toSet
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same UTC pin as Verify: timestamp-literal filters (b18/b20) and
      // date_format rendering are session-timezone-dependent — without
      // this, a non-UTC machine benches a different row set than the
      // one the oracle gate validated
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // aggressive periodic GC so finished broadcasts/shuffles are
      // reclaimed between queries instead of piling up in the one JVM
      .config("spark.cleaner.periodicGC.interval", "30s")
    // same engine config as Verify: the native ExtractNumeric rewrite is
    // part of the judged path, so it is benched too. SPARK_GRAFT_EXT=off
    // is a measurement knob only (A/B the rewrite's effect, BENCH_NOTES);
    // the driver sets nothing and always benches the judged config.
    val spark = (if (sys.env.get("SPARK_GRAFT_EXT").contains("off")) builder
                 else builder.config("spark.sql.extensions", "graft.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: spin up executors, codegen, parquet reader paths
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Interleaved repetitions of the whole suite: interleaving
    // decorrelates a query's samples from whatever the shared JVM was
    // doing right then (JIT, GC, the local VM's scheduler stalls) —
    // see the estimator note below for how samples become one number.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    // a failed run records +Infinity so it sorts LAST — a -1 sentinel
    // would sort first and silently become the reported low-order
    // statistic. At print time non-finite values become -1 (JSON has no
    // Infinity), so -1 in the artifact ALWAYS means "this run failed",
    // never "this was the fastest sample".
    // materialize through the noop sink, NOT count(): under count()
    // Catalyst prunes every unreferenced projection and drops final
    // sorts, so a1 would time an empty-column scan and a6's extracted
    // float — the very column the ExtractNumeric rewrite targets —
    // would never execute, making the SPARK_GRAFT_EXT A/B vacuous. The
    // noop write consumes every output column and discards the bytes,
    // so the benched plan is the judged plan. (Numbers from before this
    // change under-time projection-heavy queries — see BENCH_NOTES.)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => return Double.PositiveInfinity }
      (System.nanoTime() - t0) / 1e9
    }
    // 7 interleaved reps. This VM's scheduler randomly stalls task sets
    // for 2-30 s regardless of query, hitting ~30% of samples (more for
    // many-stage queries, which expose more task sets per run) — the
    // noise is strictly ADDITIVE, so low-order statistics estimate true
    // cost and high-order ones estimate the stall distribution. A
    // median is contaminated whenever most samples of one query stall
    // (observed in practice for the longest multi-stage queries), so
    // the headline per-query value is the SECOND-SMALLEST sample:
    // robust to reps-2 stalled samples, yet — unlike min — it cannot be
    // carried by one lucky sample and still moves when a real regression
    // shifts the whole clean cluster. Medians and all raw samples ride
    // along in the JSON so any number is auditable from the artifact.
    // Default 7 (was 5): the round-7 driver box stalled 4 of 5 samples
    // on several queries, breaking second-smallest-of-5; 7 survives 5
    // stalls. BENCH_NOTES.md carries the evidence.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    // Calibration probe (round-19 brief №5): a FIXED synthetic workload
    // — data-independent shuffle + agg + sort through the same noop
    // sink — measured once per rep, interleaved with the suite so it
    // samples the same box state. Same-code cross-round totals swing
    // ±20% on this VM (BENCH_NOTES (bx)), so every cross-round claim
    // used to cost a worktree A/B; dividing a query's headline by
    // calib_s yields a box-speed-normalized number whose cross-round
    // delta carries signal without the A/B tax.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(8L * 1000 * 1000)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .orderBy("k")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val calibSamples = scala.collection.mutable.ListBuffer.empty[Double]
    for (_ <- 1 to reps) {
      calibSamples += calibOnce()
      for ((name, fn) <- names)
        samples(name) = once(fn) :: samples.getOrElse(name, Nil)
    }
    // same estimator as the queries: second-smallest of reps
    val calibS = calibSamples.sorted.apply(math.min(1, reps - 1))
    val results = names.map { case (name, _) =>
      name -> samples(name).sorted.apply(math.min(1, reps - 1)) // 2nd-smallest
    }.toMap
    val medians = names.map { case (name, _) =>
      name -> samples(name).sorted.apply(reps / 2)
    }.toMap
    // 4-decimal rendering (0.1 ms, far below the noise floor) keeps the
    // contract line compact; Locale.ROOT so no locale prints 1,2345
    def j(x: Double): String =
      if (java.lang.Double.isFinite(x)) "%.4f".formatLocal(java.util.Locale.ROOT, x)
      else "-1"
    val qs = names.map { case (k, _) => s"\"" + k + "\":" + j(results(k)) }
      .mkString("{", ",", "}")
    val total = results.values.filter(java.lang.Double.isFinite).sum
    // Truncation-proof layout (BENCH_r10/r11 both lost their HEADS to
    // driver-side tail capture; round 7 lost a TAIL mid-line — so no
    // single placement is safe and every line must be independently
    // parseable): the audit detail (median + all raw samples, the
    // stall-vs-regression evidence) and the headline map are each split
    // into `#bench-… k/n` PART lines of ~25 queries behind a non-JSON
    // prefix (per-line JSON parsers skip them; a partial capture keeps
    // whole parts), and the final line is the compact driver CONTRACT
    // line carrying the FULL headline map plus an explicit
    // total_s/n_queries summary — whichever window survives, the total
    // and most of the map survive with it.
    val partSize = 25
    val parts = names.grouped(partSize).toSeq
    val n = parts.size
    for ((grp, i) <- parts.zipWithIndex) {
      val det = grp.map { case (k, _) =>
        s"\"" + k + "\":{\"med\":" + j(medians(k)) + ",\"raw\":" +
          samples(k).reverse.map(j).mkString("[", ",", "]") + "}"
      }.mkString("{", ",", "}")
      println(s"""#bench-detail ${i + 1}/$n {"queries":$det,"reps":$reps,"sf":"$sfDir"}""")
    }
    for ((grp, i) <- parts.zipWithIndex) {
      val part = grp.map { case (k, _) => s"\"" + k + "\":" + j(results(k)) }
        .mkString("{", ",", "}")
      println(s"""#bench-part ${i + 1}/$n {"queries":$part,"total_s":${j(total)},"n_queries":${names.size}}""")
    }
    println(s"""#bench-calib {"calib_s":${j(calibS)},"raw":${calibSamples.map(j).mkString("[", ",", "]")}}""")
    println(s"""{"metric":"total","value":${j(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","total_s":${j(total)},"n_queries":${names.size},"calib_s":${j(calibS)}}""")
    // The repo-artifact copy (round-13 brief item 2): BENCH_r10/r11/r13
    // all lost part of the stdout map to driver-side tail truncation,
    // so the builder's own full per-query map is ALSO written to a
    // file the judge can always parse whole. Pretty-printed one query
    // per line so a git diff of two rounds reads as a per-query delta.
    // Only full-suite runs overwrite it (a dev-loop subset would
    // silently shrink the committed artifact).
    if (only.isEmpty) {
      val med = names.map { case (k, _) => s"""    "$k": ${j(medians(k))}""" }
        .mkString("{\n", ",\n", "\n  }")
      val head = names.map { case (k, _) => s"""    "$k": ${j(results(k))}""" }
        .mkString("{\n", ",\n", "\n  }")
      val self =
        s"""{
           |  "metric": "total",
           |  "value": ${j(total)},
           |  "unit": "sec",
           |  "sf": "$sfDir",
           |  "cpus": $cpus,
           |  "reps": $reps,
           |  "n_queries": ${names.size},
           |  "total_s": ${j(total)},
           |  "estimator": "second-smallest of reps (see Bench.scala)",
           |  "calib_s": ${j(calibS)},
           |  "calib_raw": ${calibSamples.map(j).mkString("[", ", ", "]")},
           |  "queries": $head,
           |  "medians": $med
           |}
           |""".stripMargin
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_SELF.json"), self)
    }
    spark.stop()
  }
}
