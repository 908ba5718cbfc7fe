package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Headline benchmark over the query catalog.
  *
  * Contention-aware since round 7: the round-6 driver artifact showed
  * per-pass spreads up to 107x on the same query in the same JVM —
  * machine contention, not plan changes. A bench artifact must carry
  * enough evidence to DIAGNOSE that from the artifact alone, so each
  * pass now records
  *   - a fixed CPU-bound calibration time (same work every pass; any
  *     spread is the host, not the queries), and
  *   - /proc/loadavg at pass start.
  * Passes whose calibration exceeds 2x the best pass are flagged in
  * `contaminated_passes` — flagged, not silently absorbed, so a noisy
  * run is visibly noisy rather than quietly wrong.
  */
object Bench {
  /** Fixed CPU-bound probe: ~100M multiply-adds through the same
    * whole-stage-codegen path the real queries use. Identical work every
    * time, no IO, so its per-pass time is a pure host-contention meter. */
  private def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // mod keeps every intermediate well inside Long under ANSI mode:
    // id*2654435761 < 2.7e17 and the 1e8-term sum of <1e9 values < 1e17
    spark.range(0, 100000000L, 1, 8)
      .selectExpr("sum((id * 2654435761) % 1000000007) as s").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Stable fingerprint of the FINAL (post-AQE) physical plan. Enables
    * instant regression triage from the artifacts alone: identical
    * fingerprint + slower wall = environment; changed fingerprint = plan
    * regression. Expression IDs, plan ids, object addresses, JVM
    * hidden-class lambda names, higher-order-function variable counters,
    * AQE query-stage numbers and codegen stage ids are session-assigned
    * noise — normalized out so the same logical plan fingerprints
    * identically across JVMs and rounds. NOT normalized: join BUILD
    * SIDE. AQE occasionally flips BuildLeft/BuildRight on a tiny
    * symmetric join (both sides single-digit rows; the pick follows
    * stage-completion order) — q30's two 3-row aggregate sides are the
    * known case. That flip is a genuine property of the executed plan,
    * so it is reported rather than hidden; a fp change with unchanged
    * wall time and a BuildLeft/BuildRight-only diff reads as benign. */
  private[graft] def planFingerprint(df: DataFrame): String = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val s = finalPlan(df.queryExecution.executedPlan).toString
    val norm = s
      // JVM hidden-class lambda names: Foo$$$Lambda$9529/0x00007f...@1a2b
      // — the index and address depend on class-LOAD ORDER, so the same
      // plan fingerprints differently between a subset run and a
      // full-catalog run without this
      .replaceAll("\\$+Lambda\\$?\\d*(/0x[0-9a-fA-F]+)?", "\\$\\$Lambda")
      // higher-order-function variables (lambda x_594#...) draw from a
      // session-global counter — same catalog position, different number
      .replaceAll("_\\d+#", "_#")
      .replaceAll("#\\d+L?", "#")         // exprId (incl. Long-suffixed)
      .replaceAll("plan_id=\\d+", "plan_id=")
      // AQE numbers query stages in MATERIALIZATION order and
      // whole-stage-codegen ids follow — both timing-dependent, the
      // operator tree is what matters
      .replaceAll("QueryStage \\d+", "QueryStage")
      .replaceAll("\\*\\(\\d+\\)", "*")
      .replaceAll("\\[id=\\d+\\]", "[id=]")   // codegen stage ids
      .replaceAll("@[0-9a-fA-F]{4,}", "@")    // object addresses
      .replaceAll("subquery\\d+", "subquery")
      .replaceAll("cte\\d+", "cte")
      .replaceAll(", \\d+ replicas\\)", ")")  // InMemoryRelation replica n
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8"))
    md.take(6).map(b => f"$b%02x").mkString
  }

  private def loadavg(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split("\\s+").take(3).mkString(",")
      finally src.close()
    } catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned like Verify's session: without it a Bench launched outside
      // sbt would time a DIFFERENT workload (host-TZ calendar bucketing)
      // than the one whose correctness was verified
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/session init out of the measurements
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      calibrate(spark)
      SparkEntry.queries.get("q02_agg_summary").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }
    // The materialization/format ROUND-TRIP gate queries (q34-q37) write
    // parquet/CSV sinks inside the query body — that times disk write IO,
    // not query throughput. They stay in the CORRECTNESS gate; the bench
    // times the query engine.
    val sinkWriters = Set("q34_materialize_denorm", "q35_materialize_preagg",
      "q36_materialize_dim", "q37_formats_roundtrip", "q108_prune_read",
      "q129_bucket_join", "q143_table_store", "q151_snapshots")
    // N COMPLETE passes over the catalog, per-query min taken ACROSS
    // passes. Back-to-back min-of-N per query cannot escape deferred
    // cleanup noise: a heavy query's async unpersists/GC land on whichever
    // query runs next, poisoning BOTH of its consecutive iterations (the
    // r2 and r3 artifacts mis-recorded heavy-tail queries 3-4× this way).
    // Separating the iterations by a full catalog pass makes the two
    // samples independent of any one neighbor.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // SPARK_GRAFT_BENCH_ONLY: comma-separated query names, or @<file>
    // with one name per line — restricts the catalog for drift isolation
    // experiments (e.g. rerunning exactly the round-N-common subset in a
    // fresh JVM to separate catalog-size JVM pressure from plan change).
    val onlyFilter: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map { v =>
        if (v.startsWith("@"))
          scala.io.Source.fromFile(v.drop(1)).getLines()
            .map(_.trim).filter(_.nonEmpty).toSet
        else v.split(",").map(_.trim).filter(_.nonEmpty).toSet
      }
    val names = (SparkEntry.queries -- sinkWriters).keys.toSeq.sorted
      .filter(n => onlyFilter.forall(_.contains(n)))
    // every pass recorded, not just the min: a min that moves between
    // rounds is unclassifiable (noise vs drift) from a single number,
    // which is exactly what made r5's q38 delta undiagnosable from the
    // artifact alone
    val perPass = scala.collection.mutable.Map.empty[String, List[Double]]
    val planFp = scala.collection.mutable.Map.empty[String, String]
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val calib = scala.collection.mutable.ListBuffer.empty[Double]
    val loads = scala.collection.mutable.ListBuffer.empty[String]
    def runPass(pass: Int): Unit = {
      loads += loadavg()
      calib += calibrate(spark)
      for (name <- names) {
        val t0 = System.nanoTime()
        try {
          // execute the FULL plan: a bare count() lets Catalyst prune every
          // computed column, so projection-shaped queries (token stats,
          // hashing, signatures) would time an empty-schema scan instead of
          // the workload. toRdd runs the query's own physical plan with all
          // output columns materialized.
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.toRdd.count()
          val dt = (System.nanoTime() - t0) / 1e9
          perPass(name) = perPass.getOrElse(name, Nil) :+ dt
          // post-AQE fingerprint, once per query (untimed: dt is final)
          if (!planFp.contains(name)) {
            planFp(name) =
              try planFingerprint(df) catch { case _: Throwable => "" }
            // SPARK_GRAFT_BENCH_DUMP_PLANS=<dir>: write the raw final
            // plan per query — regression triage for a changed plan_fp
            sys.env.get("SPARK_GRAFT_BENCH_DUMP_PLANS").foreach { dir =>
              try {
                new java.io.File(dir).mkdirs()
                val p = df.queryExecution.executedPlan match {
                  case a: org.apache.spark.sql.execution.adaptive
                      .AdaptiveSparkPlanExec => a.executedPlan
                  case other => other
                }
                java.nio.file.Files.write(
                  java.nio.file.Paths.get(s"$dir/$name.txt"),
                  p.toString.getBytes("UTF-8"))
              } catch { case _: Throwable => () }
            }
          }
        } catch { case e: Throwable =>
          // a failure must NOT be recorded as a fast run: log it and mark
          // the query so the artifact shows -1, excluded from the total
          failed += name
          System.err.println(s"[bench] $name FAILED (pass $pass): ${e.getMessage}")
        } finally graft.ops.Caches.releaseAll()
      }
    }
    for (pass <- 1 to passes) runPass(pass)
    // regex-heavy per-row queries wobble ±10% between rounds at 3 passes
    // (r9: q68 +11%, q62 +2% — both noise); PIN them to >=5 samples so a
    // real regression separates from jitter in the artifact. Extra
    // samples for just these queries are cheap (~1s each).
    val pinned = Seq("q68_pii_redact", "q62_content_flags",
      "q47_langid", "q76_langid_full").filter(names.contains)
    val minPinnedPasses = 5
    for (n <- pinned) {
      // re-check failure each round: a query that fails mid-pinning must
      // stop (its artifact row is -1; more samples would be wasted work
      // AND internally inconsistent with the failed marker)
      while (!failed(n) && perPass.getOrElse(n, Nil).size < minPinnedPasses) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
          perPass(n) = perPass.getOrElse(n, Nil) :+
            ((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          failed += n
          System.err.println(s"[bench] $n FAILED (pinned): ${e.getMessage}")
        } finally graft.ops.Caches.releaseAll()
      }
    }
    // retry-on-contamination: a transiently busy host should not leave the
    // artifact uncertifiable when patience can buy clean passes — run up to
    // `maxExtra` additional full passes until `passes` of them calibrated
    // within 2x of the best. Contaminated passes stay recorded (flagged
    // below); per-query min across ALL passes naturally prefers clean ones.
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_EXTRA", "2").toInt
    var extra = 0
    while (extra < maxExtra &&
      calib.count(_ <= 2 * calib.min) < passes) {
      extra += 1
      System.err.println(
        s"[bench] calibration spread >2x on ${calib.size - calib.count(_ <= 2 * calib.min)} " +
          s"pass(es) — running extra pass $extra/$maxExtra")
      runPass(passes + extra)
    }
    val bestCal = if (calib.nonEmpty) calib.min else 0.0
    // 1-based pass indices whose calibration ran >2x the best pass: the
    // same fixed workload taking twice as long means the host was busy
    // during that pass, so its query times are suspect
    val contaminated = calib.zipWithIndex.collect {
      case (c, i) if bestCal > 0 && c > 2 * bestCal => i + 1
    }
    val results = names.map(n =>
      n -> (if (failed(n)) -1.0 else perPass(n).min))
    // The driver keeps only the LAST 2000 chars of stdout (every round's
    // `parsed` has been null because the full line never fit), so the
    // stdout line puts the per-query map FIRST and the headline scalars
    // LAST — whatever is truncated, the captured tail always ends with
    // metric/value/failed/contaminated. The complete evidence — full
    // precision, every pass — goes to BENCH_local.json next to the build.
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale (de, fr, …) would render 3,1416 — invalid JSON
    def fmt4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def r4(v: Double): String = if (v < 0) "-1" else fmt4(v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val passJson = names.map { n =>
      s"\"" + n + "\":" + perPass.getOrElse(n, Nil).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-query sample counts: most queries carry `passes` samples, the
    // pinned regex-heavy set >=5 — recorded so the artifact itself says
    // how much evidence sits behind each min
    val countJson = names.map { n =>
      s"\"" + n + "\":" + perPass.getOrElse(n, Nil).size
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // plan-fingerprint diff vs the previous round's committed
    // BENCH_local.json (or BENCH_rNN_local.json fallback): "identical
    // fingerprint + slower wall" = environment, "changed fingerprint" =
    // plan regression — the r9→r10 uniform-drift triage, automated.
    val fpJson = names.map(n =>
      s"\"" + n + "\":\"" + planFp.getOrElse(n, "") + "\"")
      .mkString("{", ",", "}")
    val prevFps: Map[String, String] = {
      val candidates = "BENCH_local.json" +: new java.io.File(".")
        .list().toSeq.filter(_.matches("BENCH_r\\d+_local\\.json")).sorted.reverse
      candidates.flatMap { f =>
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f)), "UTF-8")
          val obj = "\"plan_fp\":\\{([^}]*)\\}".r
            .findFirstMatchIn(txt).map(_.group(1))
          obj.map { body =>
            "\"([^\"]+)\":\"([0-9a-f]*)\"".r.findAllMatchIn(body)
              .map(m => m.group(1) -> m.group(2)).toMap
          }
        } catch { case _: Throwable => None }
      }.headOption.getOrElse(Map.empty)
    }
    val fpChanged = names.filter(n => prevFps.get(n)
      .exists(p => p.nonEmpty && planFp.getOrElse(n, "").nonEmpty
        && p != planFp(n)))
    val fpSame = names.count(n => prevFps.get(n).contains(planFp.getOrElse(n, "-")))
    val fpNew = names.count(n => !prevFps.contains(n))
    val fpDiffJson = s"""{"prev_found":${prevFps.nonEmpty},"same":$fpSame,"new_queries":$fpNew,"changed":${
      fpChanged.take(20).map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val skipped = sinkWriters.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calJson = calib.map(fmt4).mkString("[", ",", "]")
    val loadJson = loads.map("\"" + _ + "\"").mkString("[", ",", "]")
    val contamJson = contaminated.mkString("[", ",", "]")
    val summary = s""""sf":"$sfDir","passes":${calib.size},"pass_counts":$countJson,"exec":"full-plan","calibration_sec":$calJson,"loadavg":$loadJson,"skipped_sink_writers":$skipped,"detail_file":"BENCH_local.json","plan_fp_diff":$fpDiffJson,"failed":$failedJson,"contaminated_passes":$contamJson,"metric":"total","unit":"sec","value":${fmt4(total)}"""
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_local.json"),
      s"""{"queries":$fullQs,"per_pass":$passJson,"plan_fp":$fpJson,$summary}""".getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_local.json write failed: ${e.getMessage}") }
    println(s"""{"queries":$qs,$summary}""")
    spark.stop()
  }
}
