package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
      SparkEntry.queries.get("q02_agg_summary").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }
    // The materialization/format ROUND-TRIP gate queries (q34-q37) write
    // parquet/CSV sinks inside the query body — that times disk write IO,
    // not query throughput. They stay in the CORRECTNESS gate; the bench
    // times the query engine.
    val sinkWriters = Set("q34_materialize_denorm", "q35_materialize_preagg",
      "q36_materialize_dim", "q37_formats_roundtrip")
    // min of N runs per query: one slow run from GC / compilation / page
    // cache noise must not be recorded as a regression (the round-2 bench
    // artifact was noise-contaminated exactly this way)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = (SparkEntry.queries -- sinkWriters).map { case (name, fn) =>
      var ok = true
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          // a failure must NOT be recorded as a fast run: log it and mark
          // the query so the artifact shows -1, excluded from the total
          ok = false
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        finally graft.ops.Caches.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }
      if (!ok) { failed += name; name -> -1.0 } else name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val skipped = sinkWriters.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","skipped_sink_writers":$skipped,"failed":$failedJson}""")
    spark.stop()
  }
}
