package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc local smoke runner: runs the flagship entry + every catalog query
  * at a small SF and prints row counts (and optionally plans). Not part of
  * the driver contract. Usage: runMain graft.Smoke [sfDir] [--explain q01] */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.001")
    val explain = args.sliding(2).collectFirst {
      case Array("--explain", q) => q
    }
    val only = args.sliding(2).collectFirst {
      case Array("--only", q) => q
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (only.isEmpty) {
      val e = SparkEntry.entry(spark)
      println(s"[smoke] entry rows=${e.count()}")
      e.show(5, truncate = false)
    }

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(name.contains) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (explain.contains(name)) df.explain("formatted")
        val t0 = System.nanoTime()
        // full-plan execution (count() would prune computed columns and
        // time an empty scan for projection-shaped queries — see Bench)
        val n = df.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[smoke] $name%-28s rows=$n%-8d ${dt}%.2fs")
      } catch {
        case e: Throwable =>
          println(s"[smoke] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
      } finally graft.ops.Caches.releaseAll()
    }
    if (only.nonEmpty) { spark.stop(); return }

    // library-surface sample: report fan-out, relative time cuts,
    // materialized denormalized view, cuboid pre-aggregation, formats
    try {
      import graft.cells._
      import graft.browser.ReportItem
      val b = graft.tpch.TpchModel.browser(spark, sfDir)
      val r = b.report(Cell(PointCut("customer", Seq("ASIA"))), Map(
        "agg" -> ReportItem("aggregate", drilldown = Seq("returnflag"),
          aggregates = Seq("quantity_sum")),
        "members" -> ReportItem("members", dim = Some("customer"), depth = Some(1))))
      println(s"[smoke] report: agg=${r("agg").count()} members=${r("members").count()}")
      val tc = graft.browser.TimeCuts.parseCell(graft.tpch.TpchModel.cube,
        "shipdate:yesterday", java.time.LocalDateTime.of(1996, 5, 5, 0, 0))
      println(s"[smoke] timecut: ${tc.toCutString} rows=" +
        b.aggregate(cell = tc, aggregates = Seq("fact_count"))
          .cells.collect()(0).getAs[Long]("fact_count"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_smoke").toString
      graft.materialize.Materialize.createView(b, "smoke_denorm")
      println(s"[smoke] denorm view rows=" +
        spark.table("smoke_denorm").where("`customer.region_name` = 'ASIA'").count())
      graft.materialize.Materialize.preAggregate(b, Seq("returnflag"),
        Seq("quantity_sum"), s"$tmp/agg")
      graft.formats.Formats.writeCsv(spark.read.parquet(s"$tmp/agg"), s"$tmp/csv")
      println(s"[smoke] preagg+csv rows=" +
        spark.read.option("header", "true").csv(s"$tmp/csv").count())
      // authorization: restriction cell ANDed onto every browse
      val restricted = new graft.browser.Browser(
        graft.tpch.TpchModel.cube, b.star, spark,
        restrictionCell = Cell(PointCut("customer", Seq("EUROPE"))))
      println(s"[smoke] restricted count=" +
        restricted.aggregate(aggregates = Seq("fact_count"))
          .cells.collect()(0).getAs[Long]("fact_count") +
        " vs open=" +
        b.aggregate(aggregates = Seq("fact_count"))
          .cells.collect()(0).getAs[Long]("fact_count"))
      // streaming: windowed agg over the events parquet via memory sink
      val ev = graft.tpch.EventsModel.eventsTable(spark, sfDir)
      ev.write.mode("overwrite").parquet(s"$tmp/events_in")
      val stream = spark.readStream.schema(ev.schema).parquet(s"$tmp/events_in")
      val q = graft.streaming.Streaming.hourlyCounts(stream)
        .writeStream.outputMode("complete").format("memory")
        .queryName("smoke_hourly").start()
      q.processAllAvailable()
      println(s"[smoke] streaming hourly rows=${spark.table("smoke_hourly").count()}")
      q.stop()
    } catch {
      case e: Throwable =>
        println(s"[smoke] library sample FAILED: ${e.getMessage}")
        e.printStackTrace()
    }
    spark.stop()
  }
}
