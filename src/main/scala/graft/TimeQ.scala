package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness for individual catalog queries — the quick A/B
  * loop [[Bench]] is too heavy for (it runs the full catalog, 3+
  * passes). Same measurement discipline as Bench: `toRdd.count()` so
  * the full plan executes without driver materialization, min over
  * `iters` back-to-back runs, caches released between runs.
  *
  * Usage: `runMain graft.TimeQ <sfDir> <q1,q2,...> [iters]`
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val secs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        graft.ops.Caches.releaseAll()
        s
      }
      println(f"[timeq] $n%-28s min=${secs.min}%.3f  all=" +
        secs.map(s => f"$s%.2f").mkString(","))
    }
    spark.stop()
  }
}
