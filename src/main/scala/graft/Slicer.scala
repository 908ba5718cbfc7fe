package graft

import org.apache.spark.sql.SparkSession
import graft.workspace.{Workspace, WorkspaceConfig}
import graft.materialize.Materialize

/** The `slicer` CLI (reference `cubes/slicer/commands.py`): the workspace
  * verbs a config file drives —
  *
  * {{{
  * slicer serve <config.ini> [port]
  * slicer denormalize <config.ini> <cube> <target-dir> [partition-by-ref]
  * slicer aggregate <config.ini> <cube> <target-dir> [drilldown-ref ...]
  * slicer extract-dimension <config.ini> <cube> <dimension> <target-dir>
  * }}}
  *
  * `serve` maps to the reference's `slicer serve` (`commands.py:52-67`);
  * `denormalize`/`aggregate` to `slicer sql denormalize|aggregate`
  * (`commands.py:333-444`) with parquet directories as the targets —
  * the Spark-native materialization sinks. */
object Slicer {

  private def sparkSession(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = args.toList match {
    case "serve" :: config :: rest =>
      rest.headOption.foreach { p =>
        if (p.toIntOption.isEmpty) {
          System.err.println(s"bad port '$p' — usage: slicer serve <config.ini> [port]")
          sys.exit(2)
        }
      }
      val spark = sparkSession()
      val (ws, cfg) = WorkspaceConfig.loadWithConfig(spark, config)
      val port = rest.headOption.flatMap(_.toIntOption)
        .getOrElse(WorkspaceConfig.serverPort(cfg))
      val host = cfg.getOrElse("server", Map.empty)
        .getOrElse("host", "127.0.0.1")
      val server = new graft.server.SlicerServer(ws, port, host = host)
      val bound = server.start()
      println(s"slicer server listening on $host:$bound")
      Thread.currentThread().join() // serve until killed

    case "denormalize" :: config :: cube :: target :: rest =>
      val spark = sparkSession()
      val ws = WorkspaceConfig.load(spark, config)
      println(s"denormalizing cube '$cube' into '$target'")
      Materialize.writeDenormalized(ws.browser(cube), target,
        partitionBy = rest)
      spark.stop()

    case "aggregate" :: config :: cube :: target :: drilldown =>
      val spark = sparkSession()
      val ws = WorkspaceConfig.load(spark, config)
      val dd = if (drilldown.nonEmpty) drilldown
        else ws.cube(cube).dimensions.map(_.name)
      // materialize only RE-AGGREGABLE aggregates: window calculators are
      // meaningless in a cuboid sink, and avg/stddev/median cannot be
      // rolled up further from a pre-aggregate (the q35 gate pattern)
      val additive = Set("sum", "count", "count_nonempty", "min", "max")
      val aggs = ws.cube(cube).aggregates
        .filter(_.function.exists(additive.contains)).map(_.name)
      // NEVER pass an empty list down: Browser.aggregate treats Nil as
      // "all cube aggregates", which would materialize exactly the
      // non-re-aggregable cuboid this filter exists to prevent
      if (aggs.isEmpty) {
        System.err.println(s"cube '$cube' has no additive " +
          s"(${additive.mkString("/")}) aggregates to materialize; " +
          "pre-aggregation would not be re-aggregable — aborting")
        sys.exit(2)
      }
      println(s"aggregating cube '$cube' at (${dd.mkString(", ")}) " +
        s"[${aggs.mkString(", ")}] into '$target'")
      Materialize.preAggregate(ws.browser(cube), dd, aggs, target)
      spark.stop()

    case "extract-dimension" :: config :: cube :: dim :: target :: Nil =>
      val spark = sparkSession()
      val ws = WorkspaceConfig.load(spark, config)
      println(s"extracting dimension '$dim' of cube '$cube' into '$target'")
      Materialize.extractDimension(ws.browser(cube), dim, target)
      spark.stop()

    case other =>
      System.err.println(
        s"""unknown slicer invocation: ${other.mkString(" ")}
           |usage:
           |  slicer serve <config.ini> [port]
           |  slicer denormalize <config.ini> <cube> <target-dir> [partition-by-ref]
           |  slicer aggregate <config.ini> <cube> <target-dir> [drilldown-ref ...]
           |  slicer extract-dimension <config.ini> <cube> <dimension> <target-dir>""".stripMargin)
      sys.exit(2)
  }
}
