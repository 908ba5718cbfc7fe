package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Names of container-typed (array/map/struct) columns in a gate
    * query's output schema. Gate contract: none allowed — the driver's
    * pandas checker cannot hash container cells (round-9 q94/q98/q116
    * 'unhashable numpy.ndarray'); operators may return arrays, gate
    * queries must export them via array_join/to_json. */
  def containerColumns(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if (f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType => true
        case _: org.apache.spark.sql.types.MapType => true
        case _: org.apache.spark.sql.types.StructType => true
        case _ => false
      }) => f.name
    }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter for fast local
    // iteration on one gate query (the driver always passes exactly two)
    val Array(sfDir, outDir) = args.take(2)
    // "--sql-only": dump oracle_sql.json for ALL queries without running
    // any Spark query — feeds tools/oracle_lint.py, which DESCRIBEs every
    // oracle in DuckDB and fails on dtypes pandas renders differently
    // from the Spark parquet export (the recurring HUGEINT hash-mismatch
    // class from rounds 9 and 10).
    val sqlOnly = args.length > 2 && args(2) == "--sql-only"
    val only: Option[Set[String]] =
      if (args.length > 2 && !sqlOnly) Some(args(2).split(",").toSet)
      else None
    def keepOracle(name: String) = only.forall(_.contains(name))
    def keep(name: String) = !sqlOnly && keepOracle(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = containerColumns(df.schema)
        require(bad.isEmpty, s"gate query $name exports container-typed " +
          s"columns ${bad.mkString(",")} — stringify them " +
          "(array_join/to_json) before export")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failing query must leave NO stale output (a previous run's
        // parquet would silently PASS the compare) — but it must also not
        // VANISH from the artifact: the round-8 driver compare dropped
        // the three failed events queries entirely and the round read as
        // all-green. Overwrite with a one-row sentinel whose schema can
        // never match an oracle, so the failure is recorded as an
        // explicit mismatch with the message in the artifact.
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(new java.io.File(s"$outDir/$name"))
        try {
          import spark.implicits._
          Seq(("" + e.getMessage).take(500)).toDF("__verify_error__")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
      finally graft.ops.Caches.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keepOracle(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
